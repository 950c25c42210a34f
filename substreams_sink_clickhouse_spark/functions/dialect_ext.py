"""ClickHouse dialect translation — extension registries.

Round-7 widening of the lexical shim in :mod:`dialect`.  The host
module exposes three hook points, all table-driven so the rescan loop
in ``_rewrite_wraps`` / ``_rewrite_param_aggs`` stays a single code
path:

* :data:`EXT_NAME_SWAPS` — pure name swaps (same arity, same argument
  order, same semantics), merged into ``_NAME_SWAPS``.
* :data:`EXT_WRAPS` — ``name -> handler(inner, parts, literals)``
  paren-matched rewrites; ``parts`` is the top-level comma split of
  ``inner`` and ``literals`` the masked-literal table.
* :data:`EXT_PARAM_AGGS` — ClickHouse two-paren-group aggregates
  ``name(params)(args) -> handler(params, args)``; ``params`` is
  ``None`` for the legal single-group spelling.

HANDLER OUTPUT CONTRACT (see dialect._SENTINELS and the pitfalls
notes): a replacement must never contain a function name the wraps or
param-agg patterns match — use ``__xform__(`` for Spark's
``transform``, ``__sql_cast__(``/``CAST(`` (CAST self-resolves to the
sentinel), ``__sql_extract__(``, ``__tbl_range__(``, ``__chr__(``,
``__rand__(``/``__randn__(`` — and must avoid the lower-case
name-swap keys (``position(``, ``match(``, ``any(``, ``has(``).

Deviations from ClickHouse are documented per handler; the general
policies:

* UInt64-range results are represented as BIGINT (engine-wide policy,
  MIGRATION.md "unsigned integers") unless noted.
* Non-cryptographic hash names (cityHash64, sipHash64, farmHash64,
  xxHash32/64, murmurHash*) map to Spark's native xxhash64/hash with
  the ClickHouse name folded in as a salt: each function is stable and
  distinct within the engine — bucketing, sampling and dedup keep
  their contract — but values are NOT bit-equal to ClickHouse's
  (those exact algorithms are C++ kernels; a Python re-implementation
  would put a per-row UDF on the hot path for no semantic gain).
  Cryptographic digests (MD5/SHA*) ARE bit-equal.
"""

from __future__ import annotations

import re


def _lit(tok: str, literals: tuple) -> str | None:
    """The literal text (quotes included) behind a masked sentinel, or
    None when ``tok`` is not a single masked literal."""
    m = re.fullmatch(r"\x01(\d+)\x01", tok.strip())
    return literals[int(m.group(1))] if m else None


def _str_lit(tok: str, literals: tuple, what: str) -> str:
    """Unquoted value of a required string-literal argument."""
    lit = _lit(tok, literals)
    if lit is None or lit[0] not in "'\"":
        raise ValueError(f"{what} must be a string literal")
    return lit[1:-1]


def _need(parts: list[str], n: int, name: str, usage: str) -> None:
    if len(parts) != n:
        raise ValueError(f"{name} needs {usage}")


def _lam(part: str, name: str) -> tuple[str, str]:
    """Split a 1-variable ClickHouse lambda ``x -> body``; refuses a
    body that rebinds the same variable (the mapApply precedent — a
    textual substitution would capture the inner binding)."""
    if "->" not in part:
        raise ValueError(f"{name} needs a lambda as its first argument")
    var, body = part.split("->", 1)
    var = var.strip().lstrip("(").rstrip(")").strip()
    body = body.strip()
    if not re.fullmatch(r"\w+", var):
        raise ValueError(f"{name} supports single-variable lambdas only")
    if re.search(rf"\b{re.escape(var)}\s*->|\(\s*{re.escape(var)}\s*[,)]\s*->", body):
        raise ValueError(
            f"{name}: nested lambda rebinds {var!r} - rename the inner "
            "variable"
        )
    return var, body


def _subst(body: str, var: str, new: str) -> str:
    return re.sub(rf"\b{re.escape(var)}\b", new, body)


# ---------------------------------------------------------------- swaps
#: Same name, arity, argument order and semantics on both engines.
EXT_NAME_SWAPS = {
    "arrayShuffle": "shuffle",  # both: uniform random permutation
    "isValidUTF8": "is_valid_utf8",
    "lastDayOfMonth": "last_day",
    "toJSONString": "to_json",
    "JSON_VALUE": "get_json_object",  # $.path syntax is shared
    "generateUUIDv4": "uuid",
}


# ---------------------------------------------------------------- wraps
def _identity(inner, parts, literals):
    return f"({inner})"


def _negate(inner, parts, literals):
    _need(parts, 1, "negate", "(x)")
    return f"(-({inner}))"


def _ignore(inner, parts, literals):
    # ClickHouse: evaluates arguments, returns 0
    return "0"


def _is_constant(inner, parts, literals):
    # translation-time approximation: literal/sentinel operand -> 1.
    # (Spark has no runtime constancy introspection; a masked literal
    # or a bare number is exactly ClickHouse's "constant column" case.)
    _need(parts, 1, "isConstant", "(x)")
    tok = parts[0].strip()
    const = bool(
        re.fullmatch(r"\x01\d+\x01|[-+]?\d+(\.\d+)?([eE][-+]?\d+)?", tok)
    )
    return "1" if const else "0"


def _trunc(inner, parts, literals):
    # numeric truncation toward zero (Float64 result, like ClickHouse);
    # Spark's own trunc() is the date-truncation function
    if len(parts) == 1:
        x = parts[0]
        return (
            f"CAST((CASE WHEN ({x}) >= 0 THEN floor({x}) "
            f"ELSE ceil({x}) END) AS DOUBLE)"
        )
    _need(parts, 2, "trunc", "(x[, n])")
    x, nd = parts
    p = f"pow(10, {nd})"
    return (
        f"((CASE WHEN ({x}) >= 0 THEN floor(({x}) * {p}) "
        f"ELSE ceil(({x}) * {p}) END) / {p})"
    )


def _int_div_or_zero(inner, parts, literals):
    _need(parts, 2, "intDivOrZero", "(a, b)")
    a, b = parts
    return f"(CASE WHEN ({b}) = 0 THEN 0 ELSE ({a}) div ({b}) END)"


def _modulo_or_zero(inner, parts, literals):
    _need(parts, 2, "moduloOrZero", "(a, b)")
    a, b = parts
    return f"(CASE WHEN ({b}) = 0 THEN 0 ELSE ({a}) % ({b}) END)"


def _positive_modulo(inner, parts, literals):
    _need(parts, 2, "positiveModulo", "(a, b)")
    return f"pmod({parts[0]}, {parts[1]})"


#: Euclid fold: 92 iterations cover the worst case for 64-bit operands
#: (consecutive Fibonacci numbers); IF guards the %-by-zero that ANSI
#: mode would otherwise raise once the remainder reaches 0.
_GCD = (
    "aggregate(sequence(1, 92), "
    "named_struct('a', abs(CAST({a} AS BIGINT)), 'b', abs(CAST({b} AS BIGINT))), "
    "(__g, __i) -> IF(__g.b = 0, __g, "
    "named_struct('a', __g.b, 'b', __g.a % __g.b)), __g -> __g.a)"
)


def _gcd(inner, parts, literals):
    _need(parts, 2, "gcd", "(a, b)")
    return "(" + _GCD.format(a=parts[0], b=parts[1]) + ")"


def _lcm(inner, parts, literals):
    _need(parts, 2, "lcm", "(a, b)")
    a, b = parts
    g = _GCD.format(a=a, b=b)
    # bind the gcd once (1-element transform), then lcm = |a/g*b|
    return (
        f"__xform__(array({g}), __gv -> IF(__gv = 0, CAST(0 AS BIGINT), "
        f"abs((CAST({a} AS BIGINT) div __gv) * CAST({b} AS BIGINT))))[0]"
    )


def _exp2(inner, parts, literals):
    _need(parts, 1, "exp2", "(x)")
    return f"pow(CAST(2 AS DOUBLE), {inner})"


def _exp10(inner, parts, literals):
    _need(parts, 1, "exp10", "(x)")
    return f"pow(CAST(10 AS DOUBLE), {inner})"


def _int_exp2(inner, parts, literals):
    # exact for 0..62 (BIGINT); ClickHouse returns UInt64 (0..63)
    _need(parts, 1, "intExp2", "(x)")
    return f"shiftleft(CAST(1 AS BIGINT), CAST({inner} AS INT))"


def _int_exp10(inner, parts, literals):
    # exact integer fold (pow() is a DOUBLE and drifts above 2^53)
    _need(parts, 1, "intExp10", "(x)")
    return (
        f"(CASE WHEN ({inner}) <= 0 THEN CAST(1 AS BIGINT) "
        f"ELSE aggregate(sequence(1, CAST({inner} AS INT)), "
        f"CAST(1 AS BIGINT), (__a, __i) -> __a * 10) END)"
    )


#: Abramowitz & Stegun 7.1.26 rational approximation (measured abs
#: error < 5e-7) — Spark has no erf; the paired DuckDB oracles inline
#: the SAME polynomial so the gate compares like with like.
def _erf_expr(x: str) -> str:
    return (
        f"__xform__(array(1.0 / (1.0 + 0.3275911 * abs({x}))), __t -> "
        f"sign({x}) * (1.0 - (((((1.061405429 * __t - 1.453152027) * __t) "
        f"+ 1.421413741) * __t - 0.284496736) * __t + 0.254829592) * __t "
        f"* exp(-(({x}) * ({x})))))[0]"
    )


def _erf(inner, parts, literals):
    _need(parts, 1, "erf", "(x)")
    return f"({_erf_expr(inner)})"


def _erfc(inner, parts, literals):
    _need(parts, 1, "erfc", "(x)")
    return f"(1.0 - {_erf_expr(inner)})"


def _bit_rotate(left: bool):
    def h(inner, parts, literals):
        _need(parts, 2, "bitRotateLeft/Right", "(x, n)")
        x, n = parts
        a, b = ("shiftleft", "shiftrightunsigned") if left else (
            "shiftrightunsigned", "shiftleft")
        # 64-bit rotate; Java shift counts self-mask mod 64, so n=0 is
        # x|x = x.  ClickHouse rotates in the input's own width — the
        # BIGINT (64-bit) semantics is the documented choice here.
        return (
            f"({a}(CAST({x} AS BIGINT), CAST({n} AS INT)) | "
            f"{b}(CAST({x} AS BIGINT), 64 - CAST({n} AS INT)))"
        )
    return h


def _bit_test_multi(op: str, name: str):
    def h(inner, parts, literals):
        if len(parts) < 2:
            raise ValueError(f"{name} needs (x, pos1[, pos2, ...])")
        x = parts[0]
        tests = [
            f"((shiftright(CAST({x} AS BIGINT), CAST({p} AS INT)) & 1) = 1)"
            for p in parts[1:]
        ]
        return f"CAST(({(' ' + op + ' ').join(tests)}) AS TINYINT)"
    return h


def _char(inner, parts, literals):
    # n-ary ClickHouse char(): one byte per argument
    if len(parts) == 1:
        return f"__chr__({inner})"
    return "concat(" + ", ".join(f"__chr__({p})" for p in parts) + ")"


def _format(inner, parts, literals):
    # ClickHouse format('{}-{}', a, b): {} placeholders, {N} positional
    if len(parts) < 1:
        raise ValueError("format needs (pattern, args...)")
    fmt = _str_lit(parts[0], literals, "format pattern")
    fmt = fmt.replace("%", "%%")  # literal % first, placeholders after
    fmt = re.sub(r"\{(\d+)\}", lambda m: f"%{int(m.group(1)) + 1}$s", fmt)
    fmt = fmt.replace("{}", "%s")
    fmt_sql = "'" + fmt.replace("'", "''") + "'"
    rest = ", ".join(parts[1:])
    return f"format_string({fmt_sql}, {rest})"


def _normalize_query(inner, parts, literals):
    # literals -> ?, numbers -> ? (the common normalization; ClickHouse
    # additionally collapses long IN lists)
    _need(parts, 1, "normalizeQuery", "(s)")
    return (
        f"regexp_replace(regexp_replace({inner}, "
        f"'''(?:[^'']|'''''')*''', '?'), "
        f"'\\\\b\\\\d+(\\\\.\\\\d+)?\\\\b', '?')"
    )


def _string_jaccard(inner, parts, literals):
    # character-set Jaccard (ClickHouse computes byte sets; identical
    # for ASCII, a documented deviation for multi-byte input)
    _need(parts, 2, "stringJaccardIndex", "(a, b)")
    a, b = parts
    sa = f"array_distinct(filter(split({a}, ''), __c -> __c != ''))"
    sb = f"array_distinct(filter(split({b}, ''), __c -> __c != ''))"
    return (
        f"(CASE WHEN size(array_union({sa}, {sb})) = 0 THEN 0.0 "
        f"ELSE CAST(size(array_intersect({sa}, {sb})) AS DOUBLE) "
        f"/ size(array_union({sa}, {sb})) END)"
    )


def _replace_regexp_one(inner, parts, literals):
    # first-occurrence regexp replace: split at the first match (found
    # via regexp_extract of the whole match), substitute backrefs in
    # the replacement via a regexp_replace restricted to a prefix.
    _need(parts, 3, "replaceRegexpOne", "(s, pattern, replacement)")
    s, p, r = parts
    # one regexp_replace over the prefix that ends with the FIRST
    # match: locate the first match, cut the string there, replace in
    # the head (where the only match is the first), concat the tail.
    whole = f"regexp_extract({s}, {p}, 0)"
    head_len = f"(locate({whole}, {s}) + length({whole}) - 1)"
    return (
        f"(CASE WHEN {whole} = '' THEN {s} ELSE "
        f"concat(regexp_replace(substring({s}, 1, {head_len}), {p}, {r}), "
        f"substring({s}, {head_len} + 1)) END)"
    )


# cryptographic digests: ClickHouse returns raw bytes (FixedString);
# Spark's md5/sha1/sha2 return hex STRINGS — unhex restores byte
# parity so hex(MD5(x)) round-trips exactly like ClickHouse.
def _md5(inner, parts, literals):
    _need(parts, 1, "MD5", "(s)")
    return f"unhex(md5({inner}))"


def _sha1(inner, parts, literals):
    _need(parts, 1, "SHA1", "(s)")
    return f"unhex(sha1({inner}))"


def _sha_n(bits: int):
    def h(inner, parts, literals):
        _need(parts, 1, f"SHA{bits}", "(s)")
        return f"unhex(sha2({inner}, {bits}))"
    return h


def _half_md5(inner, parts, literals):
    # first 8 bytes of the MD5, big-endian UInt64 (db-independent and
    # bit-equal to ClickHouse); DECIMAL(20,0) holds the unsigned range
    _need(parts, 1, "halfMD5", "(s)")
    return (
        f"CAST(conv(substring(md5({inner}), 1, 16), 16, 10) "
        f"AS DECIMAL(20,0))"
    )


def _salted_hash64(ch_name: str):
    def h(inner, parts, literals):
        # engine-stable 64-bit hash; NOT bit-equal to ClickHouse (see
        # module docstring policy)
        return f"xxhash64('{ch_name}', {inner})"
    return h


def _salted_hash32(ch_name: str):
    def h(inner, parts, literals):
        # 32-bit range like the ClickHouse original (UInt32 as BIGINT)
        return f"(CAST(xxhash64('{ch_name}', {inner}) AS BIGINT) & 4294967295)"
    return h


def _rand(inner, parts, literals):
    # ClickHouse rand() is a uniform UInt32, not a [0,1) double —
    # rand() % N and range checks depend on it.  An argument (the
    # CSE-defeating dummy rand(x) takes) is accepted and ignored.
    return "CAST(floor(__rand__() * 4294967296) AS BIGINT)"


def _rand64(inner, parts, literals):
    # 63-bit positive range (BIGINT cannot carry the UInt64 MSB;
    # documented unsigned-range policy)
    return "CAST(floor(__rand__() * 9.223372036854775e18) AS BIGINT)"


def _rand_canonical(inner, parts, literals):
    return "__rand__()"


def _rand_uniform(inner, parts, literals):
    _need(parts, 2, "randUniform", "(lo, hi)")
    lo, hi = parts
    return f"(({lo}) + __rand__() * (({hi}) - ({lo})))"


def _rand_normal(inner, parts, literals):
    _need(parts, 2, "randNormal", "(mean, stddev)")
    m_, s_ = parts
    return f"(({m_}) + __randn__() * ({s_}))"


def _rand_bernoulli(inner, parts, literals):
    _need(parts, 1, "randBernoulli", "(p)")
    return f"CAST(__rand__() < ({inner}) AS TINYINT)"


def _rand_exponential(inner, parts, literals):
    _need(parts, 1, "randExponential", "(lambda)")
    return f"(-ln(1.0 - __rand__()) / ({inner}))"


def _to_decimal(width: int, precision: int):
    def h(inner, parts, literals):
        _need(parts, 2, f"toDecimal{width}", "(x, scale)")
        x, s = parts
        if not s.strip().isdigit():
            raise ValueError(f"toDecimal{width} needs a literal scale")
        return f"CAST({x} AS DECIMAL({precision},{int(s)}))"
    return h


def _to_uuid(inner, parts, literals):
    # UUIDs are strings engine-wide (no 128-bit type in Spark SQL);
    # normalize case so equality survives the representation change
    _need(parts, 1, "toUUID", "(s)")
    return f"lower(CAST({inner} AS STRING))"


def _to_fixed_string(inner, parts, literals):
    # pad with NUL bytes to n, exactly ClickHouse's memory layout;
    # longer input raises there, here it passes through (documented)
    _need(parts, 2, "toFixedString", "(s, n)")
    s, n = parts
    return f"rpad({s}, CAST({n} AS INT), __chr__(0))"


def _format_readable_decimal_size(inner, parts, literals):
    _need(parts, 1, "formatReadableDecimalSize", "(bytes)")
    x = inner
    return (
        f"__xform__(array(CAST({x} AS DOUBLE)), __b -> CASE "
        f"WHEN abs(__b) < 1000 THEN concat(format_string('%.2f', __b), ' B') "
        f"WHEN abs(__b) < 1e6 THEN concat(format_string('%.2f', __b / 1e3), ' KB') "
        f"WHEN abs(__b) < 1e9 THEN concat(format_string('%.2f', __b / 1e6), ' MB') "
        f"WHEN abs(__b) < 1e12 THEN concat(format_string('%.2f', __b / 1e9), ' GB') "
        f"WHEN abs(__b) < 1e15 THEN concat(format_string('%.2f', __b / 1e12), ' TB') "
        f"ELSE concat(format_string('%.2f', __b / 1e15), ' PB') END)[0]"
    )


def _format_readable_time_delta(inner, parts, literals):
    # default (max unit years) with the two most significant units —
    # ClickHouse prints every nonzero unit; the 2-unit head covers the
    # monitoring use the reference's users have (documented deviation)
    if len(parts) not in (1, 2):
        raise ValueError("formatReadableTimeDelta needs (seconds[, max_unit])")
    x = parts[0]
    return (
        f"__xform__(array(CAST({x} AS BIGINT)), __s -> "
        f"concat_ws(', ', "
        f"IF(__s div 31536000 > 0, concat(CAST(__s div 31536000 AS STRING), "
        f" IF(__s div 31536000 = 1, ' year', ' years')), NULL), "
        f"IF((__s % 31536000) div 86400 > 0, concat(CAST((__s % 31536000) div 86400 AS STRING), "
        f" IF((__s % 31536000) div 86400 = 1, ' day', ' days')), NULL), "
        f"IF((__s % 86400) div 3600 > 0, concat(CAST((__s % 86400) div 3600 AS STRING), "
        f" IF((__s % 86400) div 3600 = 1, ' hour', ' hours')), NULL), "
        f"IF((__s % 3600) div 60 > 0, concat(CAST((__s % 3600) div 60 AS STRING), "
        f" IF((__s % 3600) div 60 = 1, ' minute', ' minutes')), NULL), "
        f"IF(__s % 60 > 0 OR __s = 0, concat(CAST(__s % 60 AS STRING), "
        f" IF(__s % 60 = 1, ' second', ' seconds')), NULL)))[0]"
    )


def _parse_readable_size(inner, parts, literals):
    _need(parts, 1, "parseReadableSize", "(s)")
    s = inner
    num = f"CAST(regexp_extract(trim({s}), '^([0-9.]+)', 1) AS DOUBLE)"
    unit = f"upper(regexp_extract(trim({s}), '(?i)([KMGTPE]?I?B)\\\\s*$', 1))"
    return (
        f"CAST(round({num} * (CASE {unit} "
        f"WHEN 'B' THEN 1 "
        f"WHEN 'KB' THEN 1e3 WHEN 'MB' THEN 1e6 WHEN 'GB' THEN 1e9 "
        f"WHEN 'TB' THEN 1e12 WHEN 'PB' THEN 1e15 WHEN 'EB' THEN 1e18 "
        f"WHEN 'KIB' THEN 1024.0 WHEN 'MIB' THEN 1048576.0 "
        f"WHEN 'GIB' THEN 1073741824.0 WHEN 'TIB' THEN 1099511627776.0 "
        f"WHEN 'PIB' THEN 1125899906842624.0 "
        f"WHEN 'EIB' THEN 1152921504606846976.0 "
        f"ELSE CAST(NULL AS DOUBLE) END)) AS DECIMAL(20,0))"
    )


def _bar(inner, parts, literals):
    # unicode bar with 1/8-block resolution, ClickHouse's renderer
    if len(parts) == 3:
        parts = parts + ["80"]  # ClickHouse default width
    _need(parts, 4, "bar", "(x, min, max, width)")
    x, lo, hi, w = parts
    eighths = (
        f"CAST(floor(greatest(0.0, least(1.0, "
        f"(CAST({x} AS DOUBLE) - ({lo})) / (({hi}) - ({lo})))) "
        f"* ({w}) * 8) AS INT)"
    )
    return (
        f"__xform__(array({eighths}), __e -> concat("
        f"repeat('█', __e div 8), "
        f"element_at(array('', '▏', '▎', '▍', '▌', '▋', '▊', '▉'), "
        f"(__e % 8) + 1)))[0]"
    )


def _row_number_all_blocks(inner, parts, literals):
    # sequential row number — inherently a total order; the single
    # ORDER BY monotonically_increasing_id() window is the documented
    # scale hazard exactly like ClickHouse's own single-thread pin
    return "(row_number() OVER (ORDER BY monotonically_increasing_id()) - 1)"


def _geo_distance(inner, parts, literals):
    # same haversine sphere as greatCircleDistance (q84); ClickHouse's
    # geoDistance uses an ellipsoid correction — ≤0.5% documented delta
    _need(parts, 4, "geoDistance", "(lon1, lat1, lon2, lat2)")
    lon1, lat1, lon2, lat2 = parts
    return (
        f"(2.0 * 6371000.0 * asin(sqrt("
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin(radians(({lon2}) - ({lon1})) / 2), 2))))"
    )


def _raise_with(msg: str):
    def h(inner, parts, literals):
        raise ValueError(msg)
    return h


EXT_WRAPS: dict = {
    # conditional / identity family
    "negate": _negate,
    "toNullable": _identity,
    "materialize": _identity,
    "identity": _identity,
    "ignore": _ignore,
    "isConstant": _is_constant,
    # math
    "trunc": _trunc,
    "truncate": _trunc,
    "intDivOrZero": _int_div_or_zero,
    "moduloOrZero": _modulo_or_zero,
    "positiveModulo": _positive_modulo,
    "positive_modulo": _positive_modulo,
    "gcd": _gcd,
    "lcm": _lcm,
    "exp2": _exp2,
    "exp10": _exp10,
    "intExp2": _int_exp2,
    "intExp10": _int_exp10,
    "erf": _erf,
    "erfc": _erfc,
    # bit
    "bitRotateLeft": _bit_rotate(True),
    "bitRotateRight": _bit_rotate(False),
    "bitTestAll": _bit_test_multi("AND", "bitTestAll"),
    "bitTestAny": _bit_test_multi("OR", "bitTestAny"),
    # string
    "char": _char,
    "format": _format,
    "normalizeQuery": _normalize_query,
    "stringJaccardIndex": _string_jaccard,
    "stringJaccardIndexUTF8": _string_jaccard,
    "replaceRegexpOne": _replace_regexp_one,
    # digests / hashes / random
    "MD5": _md5,
    "SHA1": _sha1,
    "SHA224": _sha_n(224),
    "SHA256": _sha_n(256),
    "SHA384": _sha_n(384),
    "SHA512": _sha_n(512),
    "halfMD5": _half_md5,
    "cityHash64": _salted_hash64("cityHash64"),
    "farmHash64": _salted_hash64("farmHash64"),
    "farmFingerprint64": _salted_hash64("farmFingerprint64"),
    "sipHash64": _salted_hash64("sipHash64"),
    "metroHash64": _salted_hash64("metroHash64"),
    "xxHash64": _salted_hash64("xxHash64"),
    "murmurHash2_64": _salted_hash64("murmurHash2_64"),
    "murmurHash3_64": _salted_hash64("murmurHash3_64"),
    "xxHash32": _salted_hash32("xxHash32"),
    "murmurHash2_32": _salted_hash32("murmurHash2_32"),
    "murmurHash3_32": _salted_hash32("murmurHash3_32"),
    "rand": _rand,
    "rand32": _rand,
    "rand64": _rand64,
    "randCanonical": _rand_canonical,
    "randUniform": _rand_uniform,
    "randNormal": _rand_normal,
    "randBernoulli": _rand_bernoulli,
    "randExponential": _rand_exponential,
    # type conversion
    "toDecimal32": _to_decimal(32, 9),
    "toDecimal64": _to_decimal(64, 18),
    "toDecimal128": _to_decimal(128, 38),
    "toUUID": _to_uuid,
    "toFixedString": _to_fixed_string,
    # formatting / misc
    "formatReadableDecimalSize": _format_readable_decimal_size,
    "formatReadableTimeDelta": _format_readable_time_delta,
    "parseReadableSize": _parse_readable_size,
    "bar": _bar,
    "rowNumberInAllBlocks": _row_number_all_blocks,
    "geoDistance": _geo_distance,
    # curated raises: functions whose semantics need engine state or a
    # different tool — fail with the pointer instead of UNRESOLVED_ROUTINE
    "sleep": _raise_with("sleep() is a server-side test helper with no Spark meaning"),
    "sleepEachRow": _raise_with("sleepEachRow() is a server-side test helper with no Spark meaning"),
    "runningDifference": _raise_with(
        "runningDifference is block-order dependent in ClickHouse; use "
        "x - lag(x) OVER (ORDER BY <key>) with an explicit order"
    ),
    "runningAccumulate": _raise_with(
        "runningAccumulate is block-order dependent in ClickHouse; use "
        "sum(x) OVER (ORDER BY <key> ROWS UNBOUNDED PRECEDING)"
    ),
    "neighbor": _raise_with(
        "neighbor(x, n) is block-order dependent in ClickHouse; use "
        "lag/lead(x, n) OVER (ORDER BY <key>) with an explicit order"
    ),
    "dictGet": _raise_with(
        "dictGet needs dictionary state: register the dimension with "
        "the engine's dictionary operator (operators/dictionary.py) "
        "and use its lookup join"
    ),
    "dictGetOrDefault": _raise_with(
        "dictGetOrDefault needs dictionary state: register the "
        "dimension with operators/dictionary.py and use its lookup join"
    ),
    "joinGet": _raise_with(
        "joinGet reads a server-resident Join-engine table; express it "
        "as an explicit LEFT JOIN"
    ),
    "reinterpretAsUInt64": _raise_with(
        "reinterpretAs* is a raw-memory cast with no Spark SQL "
        "equivalent; use explicit CAST/unhex/conv conversions"
    ),
    "reinterpretAsString": _raise_with(
        "reinterpretAs* is a raw-memory cast with no Spark SQL "
        "equivalent; use explicit CAST/unhex/conv conversions"
    ),
}

# ------------------------------------------------------------ date/time
#: first Sunday's day-of-year (dayofweek: 1=Sunday..7=Saturday) — the
#: anchor of MySQL/ClickHouse week mode 0
_FIRST_SUNDAY = "(((8 - dayofweek(make_date(year({d}), 1, 1))) % 7) + 1)"
#: mode-0 week number of {d} (0..53): full weeks since the first Sunday
_WEEK0 = (
    "(CASE WHEN dayofyear({d}) < " + _FIRST_SUNDAY + " THEN 0 "
    "ELSE (dayofyear({d}) - " + _FIRST_SUNDAY + ") div 7 + 1 END)"
)


def _to_start_of_week(inner, parts, literals):
    # mode 0 (ClickHouse default): weeks start SUNDAY — which
    # date_trunc cannot express; modes 1/3: Monday (toMonday)
    d = parts[0]
    mode = parts[1].strip() if len(parts) > 1 else "0"
    if mode in ("0", "2"):
        return f"date_sub(CAST({d} AS DATE), dayofweek({d}) - 1)"
    if mode in ("1", "3"):
        return f"date_sub(CAST({d} AS DATE), weekday({d}))"
    raise ValueError("toStartOfWeek mode must be a literal 0..3")


def _to_time(inner, parts, literals):
    # ClickHouse: keep the time of day, pin the date to 1970-01-02
    _need(parts, 1, "toTime", "(ts)")
    return (
        f"CAST(concat('1970-01-02 ', date_format({inner}, 'HH:mm:ss')) "
        f"AS TIMESTAMP)"
    )


def _to_week(inner, parts, literals):
    d = parts[0]
    mode = parts[1].strip() if len(parts) > 1 else "0"
    if mode == "0":
        return "__xform__(array(CAST(" + d + " AS DATE)), __d -> " + \
            _WEEK0.format(d="__d") + ")[0]"
    if mode == "3":
        return f"weekofyear({d})"
    raise ValueError(
        "toWeek supports literal modes 0 (Sunday-first, ClickHouse "
        "default) and 3 (ISO; also toISOWeek)"
    )


def _to_year_week(inner, parts, literals):
    d = parts[0]
    mode = parts[1].strip() if len(parts) > 1 else "0"
    if mode == "3":
        return f"(extract(YEAROFWEEK FROM {d}) * 100 + weekofyear({d}))"
    if mode != "0":
        raise ValueError("toYearWeek supports literal modes 0 and 3")
    # week 0 belongs to the PREVIOUS year's last mode-0 week
    w_cur = _WEEK0.format(d="__d")
    w_dec31 = _WEEK0.format(d="make_date(year(__d) - 1, 12, 31)")
    return (
        f"__xform__(array(CAST({d} AS DATE)), __d -> "
        f"IF({w_cur} > 0, year(__d) * 100 + {w_cur}, "
        f"(year(__d) - 1) * 100 + {w_dec31}))[0]"
    )


def _timestamp_add(inner, parts, literals):
    _need(parts, 2, "timestampAdd", "(ts, INTERVAL n unit)")
    return f"(({parts[0]}) + ({parts[1]}))"


def _timestamp_sub(inner, parts, literals):
    _need(parts, 2, "timestampSub", "(ts, INTERVAL n unit)")
    return f"(({parts[0]}) - ({parts[1]}))"


_DATE_NAME_PARTS = {
    "year": "CAST(year({d}) AS STRING)",
    "quarter": "CAST(quarter({d}) AS STRING)",
    "month": "date_format({d}, 'MMMM')",
    "week": "CAST(weekofyear({d}) AS STRING)",
    "dayofyear": "CAST(dayofyear({d}) AS STRING)",
    "day": "CAST(dayofmonth({d}) AS STRING)",
    "weekday": "date_format({d}, 'EEEE')",
    "hour": "CAST(hour({d}) AS STRING)",
    "minute": "CAST(minute({d}) AS STRING)",
    "second": "CAST(second({d}) AS STRING)",
}


def _date_name(inner, parts, literals):
    _need(parts, 2, "dateName", "('part', date)")
    part = _str_lit(parts[0], literals, "dateName part").lower()
    if part not in _DATE_NAME_PARTS:
        raise ValueError(
            f"dateName part {part!r} unsupported "
            f"(supported: {sorted(_DATE_NAME_PARTS)})"
        )
    return _DATE_NAME_PARTS[part].format(d=parts[1])


def _to_mjd(inner, parts, literals):
    _need(parts, 1, "toModifiedJulianDay", "(date_string)")
    return f"CAST(datediff(CAST({inner} AS DATE), DATE'1858-11-17') AS INT)"


def _to_mjd_or_null(inner, parts, literals):
    _need(parts, 1, "toModifiedJulianDayOrNull", "(date_string)")
    return (
        f"CAST(datediff(TRY_CAST({inner} AS DATE), DATE'1858-11-17') AS INT)"
    )


def _from_mjd(inner, parts, literals):
    _need(parts, 1, "fromModifiedJulianDay", "(n)")
    return f"date_add(DATE'1858-11-17', CAST({inner} AS INT))"


#: ClickHouse formatDateTime %-sequences -> Java DateTimeFormatter
#: letters (the modern defaults: %M is the month NAME, %i minutes).
_PCT_MAP = {
    "a": "EEE", "b": "MMM", "c": "MM", "d": "dd", "D": "MM/dd/yy",
    "e": "d", "F": "yyyy-MM-dd", "h": "hh", "H": "HH", "i": "mm",
    "I": "hh", "j": "DDD", "k": "H", "l": "h", "m": "MM", "M": "MMMM",
    "p": "a", "Q": "Q", "r": "hh:mm:ss a", "R": "HH:mm", "s": "ss",
    "S": "ss", "T": "HH:mm:ss", "W": "EEEE", "y": "yy", "Y": "yyyy",
}


def _pct_to_java(fmt: str, who: str) -> str:
    out: list[str] = []
    lit: list[str] = []

    def flush():
        if lit:
            out.append("'" + "".join(lit).replace("'", "''") + "'")
            lit.clear()

    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%":
            if i + 1 >= len(fmt):
                raise ValueError(f"{who}: trailing %% in format")
            nxt = fmt[i + 1]
            if nxt == "%":
                lit.append("%")
            elif nxt == "n":
                lit.append("\n")
            elif nxt == "t":
                lit.append("\t")
            elif nxt in _PCT_MAP:
                flush()
                out.append(_PCT_MAP[nxt])
            else:
                raise ValueError(
                    f"{who}: %{nxt} unsupported "
                    f"(supported: %{'%, %'.join(sorted(_PCT_MAP))})"
                )
            i += 2
        else:
            lit.append(ch)
            i += 1
    flush()
    return "".join(out)


def _format_date_time(inner, parts, literals):
    if len(parts) not in (2, 3):
        raise ValueError("formatDateTime needs (ts, 'format'[, tz])")
    fmt = _str_lit(parts[1], literals, "formatDateTime format")
    java = _pct_to_java(fmt, "formatDateTime").replace("'", "''")
    return f"date_format({parts[0]}, '{java}')"


def _parse_date_time(inner, parts, literals):
    if len(parts) not in (2, 3):
        raise ValueError("parseDateTime needs (s, 'format'[, tz])")
    fmt = _str_lit(parts[1], literals, "parseDateTime format")
    java = _pct_to_java(fmt, "parseDateTime").replace("'", "''")
    return f"to_timestamp({parts[0]}, '{java}')"


def _best_effort(null_mode: str):
    def h(inner, parts, literals):
        x = parts[0]
        # the documented cascade: ISO (Spark's default parser),
        # slashed and dotted day-first forms, then digit strings as
        # Unix seconds — the reference's own coercion rule
        c = (
            f"coalesce(try_to_timestamp({x}), "
            f"try_to_timestamp({x}, 'yyyy/MM/dd HH:mm:ss'), "
            f"try_to_timestamp({x}, 'yyyy/MM/dd'), "
            f"try_to_timestamp({x}, 'dd.MM.yyyy'), "
            f"try_to_timestamp({x}, 'dd/MM/yyyy'), "
            f"(CASE WHEN CAST({x} AS STRING) RLIKE '^[0-9]{{10}}$' "
            f"THEN timestamp_seconds(CAST({x} AS BIGINT)) END)"
        )
        if null_mode == "zero":
            return c + ", TIMESTAMP'1970-01-01 00:00:00')"
        return c + ")"
    return h


def _to_yyyymmddhhmmss(inner, parts, literals):
    _need(parts, 1, "toYYYYMMDDhhmmss", "(ts)")
    return f"CAST(date_format({inner}, 'yyyyMMddHHmmss') AS BIGINT)"


def _make_date(inner, parts, literals):
    if len(parts) == 3:
        return f"make_date({inner})"
    if len(parts) == 2:  # (year, day_of_year)
        y, doy = parts
        return f"date_add(make_date({y}, 1, 1), CAST({doy} AS INT) - 1)"
    raise ValueError("makeDate needs (y, m, d) or (y, day_of_year)")


def _make_date_time(inner, parts, literals):
    if len(parts) not in (6, 7):
        raise ValueError("makeDateTime needs (y, m, d, h, mi, s[, tz])")
    return f"make_timestamp({', '.join(parts[:6])})"


EXT_WRAPS.update({
    "toStartOfWeek": _to_start_of_week,
    "toTime": _to_time,
    "toWeek": _to_week,
    "toYearWeek": _to_year_week,
    "timestampAdd": _timestamp_add,
    "timestamp_add": _timestamp_add,
    "timestampSub": _timestamp_sub,
    "timestamp_sub": _timestamp_sub,
    "dateName": _date_name,
    "toModifiedJulianDay": _to_mjd,
    "toModifiedJulianDayOrNull": _to_mjd_or_null,
    "fromModifiedJulianDay": _from_mjd,
    "formatDateTime": _format_date_time,
    "parseDateTime": _parse_date_time,
    "parseDateTimeBestEffort": _best_effort("null"),
    "parseDateTimeBestEffortOrNull": _best_effort("null"),
    "parseDateTimeBestEffortOrZero": _best_effort("zero"),
    "toYYYYMMDDhhmmss": _to_yyyymmddhhmmss,
    "makeDate": _make_date,
    "makeDateTime": _make_date_time,
})


# ------------------------------------------------------- arrays / maps
def _array_sort_k(desc: bool):
    def h(inner, parts, literals):
        name = "arrayReverseSort" if desc else "arraySort"
        if len(parts) == 1:
            return f"sort_array({parts[0]}{', false' if desc else ''})"
        _need(parts, 2, name, "([key_lambda,] array)")
        var, body = _lam(parts[0], name)
        kl = _subst(body, var, "__sl")
        kr = _subst(body, var, "__sr")
        lo, hi = ("1", "-1") if desc else ("-1", "1")
        # keyed sort via a three-way comparator; NULL keys compare as
        # equal (ClickHouse pins NULLs last — documented deviation)
        return (
            f"array_sort({parts[1]}, (__sl, __sr) -> "
            f"CASE WHEN ({kl}) < ({kr}) THEN {lo} "
            f"WHEN ({kl}) > ({kr}) THEN {hi} ELSE 0 END)"
        )
    return h


def _array_fill(rev: bool):
    def h(inner, parts, literals):
        name = "arrayReverseFill" if rev else "arrayFill"
        _need(parts, 2, name, "(pred_lambda, array)")
        var, body = _lam(parts[0], name)
        arr = f"reverse({parts[1]})" if rev else parts[1]
        filled = (
            f"(CASE WHEN size({arr}) = 0 THEN {arr} "
            f"ELSE aggregate(slice({arr}, 2, size({arr}) - 1), "
            f"array(element_at({arr}, 1)), "
            f"(__fa, {var}) -> IF({body}, array_append(__fa, {var}), "
            f"array_append(__fa, element_at(__fa, -1)))) END)"
        )
        return f"reverse({filled})" if rev else filled
    return h


def _array_split(inner, parts, literals):
    # single-array form: start a new group BEFORE each element where
    # the predicate holds (the split before the first element never
    # creates a leading empty group, matching ClickHouse)
    _need(parts, 2, "arraySplit", "(pred_lambda, array)")
    var, body = _lam(parts[0], "arraySplit")
    arr = parts[1]
    return (
        f"(CASE WHEN size({arr}) = 0 THEN array(array()) "
        f"ELSE aggregate(slice({arr}, 2, size({arr}) - 1), "
        f"array(array(element_at({arr}, 1))), "
        f"(__sp, {var}) -> IF({body}, array_append(__sp, array({var})), "
        f"array_append(slice(__sp, 1, size(__sp) - 1), "
        f"array_append(element_at(__sp, -1), {var})))) END)"
    )


def _array_product(inner, parts, literals):
    _need(parts, 1, "arrayProduct", "(array)")
    return (
        f"aggregate({inner}, CAST(1 AS DOUBLE), (__pa, __px) -> __pa * __px)"
    )


def _array_auc(inner, parts, literals):
    # pairwise AUC with half-credit ties — O(P*N) inside one row's
    # arrays (scores/labels are per-row vectors, not table columns)
    _need(parts, 2, "arrayAUC", "(scores, labels)")
    sc, lb = parts
    pairs = (
        f"__xform__(sequence(1, size(__ab.sc)), __i -> "
        f"named_struct('s', element_at(__ab.sc, __i), "
        f"'y', element_at(__ab.lb, __i)))"
    )
    return (
        f"__xform__(array(named_struct('sc', {sc}, 'lb', {lb})), __ab -> "
        f"__xform__(array(named_struct("
        f"'p', filter({pairs}, __p -> __p.y = 1), "
        f"'n', filter({pairs}, __q -> NOT (__q.y = 1)))), __pn -> "
        f"CASE WHEN size(__pn.p) = 0 OR size(__pn.n) = 0 "
        f"THEN CAST('NaN' AS DOUBLE) "
        f"ELSE aggregate(__pn.p, CAST(0 AS DOUBLE), (__a, __pp) -> __a "
        f"+ size(filter(__pn.n, __nn -> __nn.s < __pp.s)) "
        f"+ 0.5 * size(filter(__pn.n, __nn -> __nn.s = __pp.s))) "
        f"/ (CAST(size(__pn.p) AS DOUBLE) * size(__pn.n)) END)[0])[0]"
    )


def _has_substr(inner, parts, literals):
    _need(parts, 2, "hasSubstr", "(haystack_array, needle_array)")
    a, b = parts
    return (
        f"(CASE WHEN size({b}) = 0 THEN true "
        f"WHEN size({a}) < size({b}) THEN false "
        f"ELSE size(filter(sequence(1, size({a}) - size({b}) + 1), "
        f"__hs -> slice({a}, __hs, size({b})) = {b})) > 0 END)"
    )


def _range(inner, parts, literals):
    # scalar array range: [start, end) with positive step; guarded so
    # the empty case never hits sequence()'s descending default
    if len(parts) == 1:
        n = parts[0]
        return (
            f"(CASE WHEN ({n}) <= 0 THEN CAST(array() AS ARRAY<BIGINT>) "
            f"ELSE sequence(CAST(0 AS BIGINT), CAST({n} AS BIGINT) - 1) END)"
        )
    if len(parts) == 2:
        s, e = parts
        return (
            f"(CASE WHEN ({e}) <= ({s}) THEN CAST(array() AS ARRAY<BIGINT>) "
            f"ELSE sequence(CAST({s} AS BIGINT), CAST({e} AS BIGINT) - 1) END)"
        )
    _need(parts, 3, "range", "([start,] end[, step])")
    s, e, st = parts
    return (
        f"(CASE WHEN ({st}) <= 0 THEN CAST(NULL AS ARRAY<BIGINT>) "
        f"WHEN ({e}) <= ({s}) THEN CAST(array() AS ARRAY<BIGINT>) "
        f"ELSE sequence(CAST({s} AS BIGINT), CAST({s} AS BIGINT) + "
        f"((CAST({e} AS BIGINT) - CAST({s} AS BIGINT) - 1) div "
        f"CAST({st} AS BIGINT)) * CAST({st} AS BIGINT), "
        f"CAST({st} AS BIGINT)) END)"
    )


def _vec_norm(kind: str):
    def h(inner, parts, literals):
        _need(parts, 1, f"{kind}Norm", "(vector)")
        v = inner
        if kind == "L1":
            return (
                f"aggregate({v}, CAST(0 AS DOUBLE), "
                f"(__na, __nx) -> __na + abs(__nx))"
            )
        sq = (
            f"aggregate({v}, CAST(0 AS DOUBLE), "
            f"(__na, __nx) -> __na + __nx * __nx)"
        )
        if kind == "L2Squared":
            return sq
        if kind == "L2":
            return f"sqrt({sq})"
        return f"array_max(__xform__({v}, __nx -> abs(CAST(__nx AS DOUBLE))))"
    return h


def _vec_normalize(kind: str):
    def h(inner, parts, literals):
        _need(parts, 1, f"{kind}Normalize", "(vector)")
        norm = _vec_norm(kind)(inner, parts, literals)
        # zero vector: pass through as doubles (a bare division would
        # be an ANSI divide-by-zero error; ClickHouse emits nan/inf)
        return (
            f"__xform__(array({norm}), __nn -> IF(__nn = 0, "
            f"__xform__({inner}, __nx -> CAST(__nx AS DOUBLE)), "
            f"__xform__({inner}, __nx -> CAST(__nx AS DOUBLE) / __nn)))[0]"
        )
    return h


def _map_addsub(op: str):
    def h(inner, parts, literals):
        if len(parts) < 2:
            raise ValueError("mapAdd/mapSubtract need at least two maps")
        acc = parts[0]
        sign = "+" if op == "add" else "-"
        for nxt in parts[1:]:
            acc = (
                f"map_zip_with({acc}, {nxt}, (__mk, __ma, __mb) -> "
                f"coalesce(__ma, 0) {sign} coalesce(__mb, 0))"
            )
        return acc
    return h


# ------------------------------------------------------------------ JSON
def _json_static_path(parts: list[str], literals: tuple, who: str) -> str:
    """Build a literal JSONPath from literal keys / 1-based indices."""
    segs = []
    for k in parts[1:]:
        lit = _lit(k, literals)
        if lit is not None and lit[0] in "'\"":
            segs.append("." + lit[1:-1])
        elif k.strip().isdigit() and int(k.strip()) >= 1:
            segs.append(f"[{int(k.strip()) - 1}]")  # ClickHouse is 1-based
        else:
            raise ValueError(
                f"{who} needs literal keys/indices (variant paths "
                "resolve at translation time)"
            )
    return "$" + "".join(segs)


def _json_extract_raw(inner, parts, literals):
    if len(parts) < 1:
        raise ValueError("JSONExtractRaw needs (json[, keys...])")
    path = _json_static_path(parts, literals, "JSONExtractRaw")
    return (
        f"coalesce(to_json(variant_get(try_parse_json({parts[0]}), "
        f"'{path}')), '')"
    )


def _json_extract_array_raw(inner, parts, literals):
    if len(parts) < 1:
        raise ValueError("JSONExtractArrayRaw needs (json[, keys...])")
    path = _json_static_path(parts, literals, "JSONExtractArrayRaw")
    return (
        f"coalesce(__xform__(TRY_CAST(variant_get(try_parse_json("
        f"{parts[0]}), '{path}') AS ARRAY<VARIANT>), __jv -> "
        f"to_json(__jv)), CAST(array() AS ARRAY<STRING>))"
    )


def _json_query(inner, parts, literals):
    # ClickHouse JSON_QUERY wraps every result in a [...] array
    _need(parts, 2, "JSON_QUERY", "(json, '$.path')")
    j, p = parts
    v = f"to_json(variant_get(try_parse_json({j}), {p}))"
    return f"(CASE WHEN {v} IS NULL THEN '' ELSE concat('[', {v}, ']') END)"


def _json_exists(inner, parts, literals):
    _need(parts, 2, "JSON_EXISTS", "(json, '$.path')")
    j, p = parts
    return (
        f"CAST(variant_get(try_parse_json({j}), {p}) IS NOT NULL AS INT)"
    )


def _simple_json(kind: str):
    # simpleJSON*/visitParam*: fast TOP-LEVEL-only scanners in
    # ClickHouse; the path form is a faithful superset
    def h(inner, parts, literals):
        _need(parts, 2, "simpleJSONExtract*", "(json, 'key')")
        j, k = parts
        got = f"get_json_object({j}, concat('$.', {k}))"
        return {
            "string": got,
            "int": f"CAST({got} AS BIGINT)",
            "float": f"CAST({got} AS DOUBLE)",
            "bool": f"CAST({got} AS BOOLEAN)",
            "raw": (
                f"coalesce(to_json(variant_get(try_parse_json({j}), "
                f"concat('$.', {k}))), '')"
            ),
            "has": f"CAST({got} IS NOT NULL AS INT)",
        }[kind]
    return h


# ------------------------------------------------------------------- URL
_HOST_RE = r"'^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@?#]*@)?([^/:?#]+)'"


def _url_domain(inner, parts, literals):
    # regex instead of parse_url: ClickHouse's domain() also accepts
    # scheme-less host[:port] strings
    _need(parts, 1, "domain", "(url)")
    return f"coalesce(regexp_extract({inner}, {_HOST_RE}, 1), '')"


def _url_tld(inner, parts, literals):
    _need(parts, 1, "topLevelDomain", "(url)")
    host = f"coalesce(regexp_extract({inner}, {_HOST_RE}, 1), '')"
    return (
        f"__xform__(array({host}), __h -> CASE WHEN __h RLIKE "
        f"'\\\\.' AND NOT __h RLIKE '^[0-9.]+$' "
        f"THEN substring_index(__h, '.', -1) ELSE '' END)[0]"
    )


def _url_path(full: bool):
    def h(inner, parts, literals):
        _need(parts, 1, "path/pathFull", "(url)")
        # strip scheme+authority; path() additionally cuts ?query#frag
        rest = (
            f"regexp_replace({inner}, "
            f"'^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', '')"
        )
        if full:
            return rest
        return f"substring_index(substring_index({rest}, '?', 1), '#', 1)"
    return h


def _url_param(inner, parts, literals):
    _need(parts, 2, "extractURLParameter", "(url, name)")
    u, k = parts
    return f"coalesce(parse_url({u}, 'QUERY', {k}), '')"


def _url_params(inner, parts, literals):
    _need(parts, 1, "extractURLParameters", "(url)")
    return (
        f"filter(split(coalesce(parse_url({inner}, 'QUERY'), ''), '&'), "
        f"__up -> __up != '')"
    )


def _url_param_names(inner, parts, literals):
    _need(parts, 1, "extractURLParameterNames", "(url)")
    return (
        f"__xform__(filter(split(coalesce(parse_url({inner}, 'QUERY'), "
        f"''), '&'), __up -> __up != ''), "
        f"__up -> substring_index(__up, '=', 1))"
    )


def _cut_www(inner, parts, literals):
    _need(parts, 1, "cutWWW", "(url)")
    return (
        f"regexp_replace({inner}, "
        f"'^((?:[a-zA-Z][a-zA-Z0-9+.-]*://)?)www\\\\.', '$1')"
    )


#: effective-2nd-level labels under which the significant label is one
#: deeper (the common public-suffix cases; ClickHouse ships the full
#: publicsuffix list — documented heuristic subset)
_SLD_SET = "('com', 'net', 'org', 'co', 'edu', 'gov', 'mil', 'ac', 'biz', 'info')"


def _first_significant_subdomain(inner, parts, literals):
    _need(parts, 1, "firstSignificantSubdomain", "(url)")
    host = f"coalesce(regexp_extract({inner}, {_HOST_RE}, 1), '')"
    return (
        f"__xform__(array(split({host}, '\\\\.')), __hp -> CASE "
        f"WHEN size(__hp) >= 3 AND element_at(__hp, -2) IN {_SLD_SET} "
        f"THEN element_at(__hp, -3) "
        f"WHEN size(__hp) >= 2 THEN element_at(__hp, -2) "
        f"ELSE array_join(__hp, '.') END)[0]"
    )


def _cut_to_first_significant_subdomain(inner, parts, literals):
    _need(parts, 1, "cutToFirstSignificantSubdomain", "(url)")
    host = f"coalesce(regexp_extract({inner}, {_HOST_RE}, 1), '')"
    return (
        f"__xform__(array(split({host}, '\\\\.')), __hp -> CASE "
        f"WHEN size(__hp) >= 3 AND element_at(__hp, -2) IN {_SLD_SET} "
        f"THEN array_join(slice(__hp, size(__hp) - 2, 3), '.') "
        f"WHEN size(__hp) >= 2 "
        f"THEN array_join(slice(__hp, size(__hp) - 1, 2), '.') "
        f"ELSE '' END)[0]"
    )


def _netloc(inner, parts, literals):
    _need(parts, 1, "netloc", "(url)")
    return (
        f"coalesce(regexp_extract({inner}, "
        f"'^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?([^/?#]*)', 1), '')"
    )


def _encode_url_component(inner, parts, literals):
    # url_encode is form-encoding (space -> +); percent-encode instead
    _need(parts, 1, "encodeURLComponent", "(s)")
    return f"replace(url_encode({inner}), '+', '%20')"


# -------------------------------------------------------------------- IP
_IPV4_RE = (
    "'^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\\\.){3}"
    "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$'"
)
#: the standard 8-alternative IPv6 pattern (incl. :: compression and
#: the IPv4-mapped tail)
_IPV6_RE = (
    "'^(([0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}|"
    "([0-9A-Fa-f]{1,4}:){1,7}:|"
    "([0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4}|"
    "([0-9A-Fa-f]{1,4}:){1,5}(:[0-9A-Fa-f]{1,4}){1,2}|"
    "([0-9A-Fa-f]{1,4}:){1,4}(:[0-9A-Fa-f]{1,4}){1,3}|"
    "([0-9A-Fa-f]{1,4}:){1,3}(:[0-9A-Fa-f]{1,4}){1,4}|"
    "([0-9A-Fa-f]{1,4}:){1,2}(:[0-9A-Fa-f]{1,4}){1,5}|"
    "[0-9A-Fa-f]{1,4}:((:[0-9A-Fa-f]{1,4}){1,6})|"
    ":((:[0-9A-Fa-f]{1,4}){1,7}|:)|"
    "::(ffff(:0{1,4})?:)?((25[0-5]|(2[0-4]|1?[0-9])?[0-9])\\\\.){3}"
    "(25[0-5]|(2[0-4]|1?[0-9])?[0-9])|"
    "([0-9A-Fa-f]{1,4}:){1,4}:((25[0-5]|(2[0-4]|1?[0-9])?[0-9])\\\\.){3}"
    "(25[0-5]|(2[0-4]|1?[0-9])?[0-9]))$'"
)


def _ipv4_num(x: str) -> str:
    return (
        f"(CAST(split_part({x}, '.', 1) AS BIGINT) * 16777216 + "
        f"CAST(split_part({x}, '.', 2) AS BIGINT) * 65536 + "
        f"CAST(split_part({x}, '.', 3) AS BIGINT) * 256 + "
        f"CAST(split_part({x}, '.', 4) AS BIGINT))"
    )


def _ipv4_string_to_num_or(dflt: str | None):
    def h(inner, parts, literals):
        _need(parts, 1, "IPv4StringToNumOrNull/Default", "(s)")
        x = inner
        fb = "CAST(NULL AS BIGINT)" if dflt is None else dflt
        return (
            f"(CASE WHEN {x} RLIKE {_IPV4_RE} THEN {_ipv4_num(x)} "
            f"ELSE {fb} END)"
        )
    return h


def _is_ipv4_string(inner, parts, literals):
    _need(parts, 1, "isIPv4String", "(s)")
    return f"CAST({inner} RLIKE {_IPV4_RE} AS INT)"


def _is_ipv6_string(inner, parts, literals):
    _need(parts, 1, "isIPv6String", "(s)")
    return f"CAST({inner} RLIKE {_IPV6_RE} AS INT)"


def _ipv4_cidr_to_range(inner, parts, literals):
    _need(parts, 2, "IPv4CIDRToRange", "(ipv4_num, prefix_bits)")
    ip, b = parts
    span = f"shiftleft(CAST(1 AS BIGINT), 32 - CAST({b} AS INT))"
    lo = f"((CAST({ip} AS BIGINT) div {span}) * {span})"
    return (
        f"named_struct('col1', {lo}, 'col2', {lo} + {span} - 1)"
    )


def _is_ip_address_in_range(inner, parts, literals):
    _need(parts, 2, "isIPAddressInRange", "(ip_string, 'cidr')")
    cidr = _str_lit(parts[1], literals, "isIPAddressInRange CIDR")
    if ":" in cidr:
        raise ValueError(
            "isIPAddressInRange supports IPv4 CIDR literals here "
            "(IPv6 needs 128-bit arithmetic)"
        )
    base, _, bits = cidr.partition("/")
    octs = base.split(".")
    if len(octs) != 4 or not bits.isdigit() or not all(
        o.isdigit() and 0 <= int(o) <= 255 for o in octs
    ):
        raise ValueError(f"malformed IPv4 CIDR literal {cidr!r}")
    num = (
        int(octs[0]) * 16777216 + int(octs[1]) * 65536
        + int(octs[2]) * 256 + int(octs[3])
    )
    span = 1 << (32 - int(bits))
    lo = (num // span) * span
    hi = lo + span - 1
    x = parts[0]
    return (
        f"(CASE WHEN {x} RLIKE {_IPV4_RE} "
        f"THEN CAST({_ipv4_num(x)} BETWEEN {lo} AND {hi} AS INT) "
        f"ELSE 0 END)"
    )


def _to_ipv4(or_null: bool):
    def h(inner, parts, literals):
        _need(parts, 1, "toIPv4", "(s)")
        x = inner
        if or_null:
            return (
                f"(CASE WHEN {x} RLIKE {_IPV4_RE} THEN {_ipv4_num(x)} "
                f"ELSE CAST(NULL AS BIGINT) END)"
            )
        return _ipv4_num(x)
    return h


# -------------------------------------------------------------- geo
def _point_in_polygon(inner, parts, literals):
    # ray casting over the closed ring; tuple()/named_struct vertices
    # with col1=x, col2=y (the tuple handler's field names).  try_divide
    # keeps horizontal edges from raising under ANSI (condition is
    # false there anyway).
    _need(parts, 2, "pointInPolygon", "(tuple(x, y), [tuple(x, y), ...])")
    pt, poly = parts
    return (
        f"__xform__(array(named_struct('x', CAST(({pt}).col1 AS DOUBLE), "
        f"'y', CAST(({pt}).col2 AS DOUBLE), 'pg', {poly})), __pp -> "
        f"CAST(aggregate(sequence(1, size(__pp.pg)), "
        f"named_struct('c', false), (__st, __i) -> "
        f"__xform__(array(named_struct("
        f"'a', element_at(__pp.pg, __i), "
        f"'b', element_at(__pp.pg, IF(__i = size(__pp.pg), 1, __i + 1)))), "
        f"__e -> IF(((__e.a.col2 > __pp.y) != (__e.b.col2 > __pp.y)) "
        f"AND (__pp.x < coalesce(try_divide("
        f"(__e.b.col1 - __e.a.col1) * (__pp.y - __e.a.col2), "
        f"CAST(__e.b.col2 - __e.a.col2 AS DOUBLE)), CAST(0 AS DOUBLE)) "
        f"+ __e.a.col1), named_struct('c', NOT __st.c), __st))[0], "
        f"__st -> __st.c) AS INT))[0]"
    )


_GEOHASH32 = "'0123456789bcdefghjkmnpqrstuvwxyz'"


def _geohash_encode(inner, parts, literals):
    if len(parts) == 2:
        parts = parts + ["12"]  # ClickHouse default precision
    _need(parts, 3, "geohashEncode", "(lon, lat, precision)")
    lon, lat, p = parts
    ns = (
        "named_struct('lolo', {lolo}, 'lohi', {lohi}, "
        "'lalo', {lalo}, 'lahi', {lahi}, 'bits', {bits})"
    )
    lon_hi = ns.format(
        lolo="(__g.lolo + __g.lohi) / 2", lohi="__g.lohi",
        lalo="__g.lalo", lahi="__g.lahi",
        bits="array_append(__g.bits, 1)")
    lon_lo = ns.format(
        lolo="__g.lolo", lohi="(__g.lolo + __g.lohi) / 2",
        lalo="__g.lalo", lahi="__g.lahi",
        bits="array_append(__g.bits, 0)")
    lat_hi = ns.format(
        lolo="__g.lolo", lohi="__g.lohi",
        lalo="(__g.lalo + __g.lahi) / 2", lahi="__g.lahi",
        bits="array_append(__g.bits, 1)")
    lat_lo = ns.format(
        lolo="__g.lolo", lohi="__g.lohi",
        lalo="__g.lalo", lahi="(__g.lalo + __g.lahi) / 2",
        bits="array_append(__g.bits, 0)")
    seed = ns.format(
        lolo="CAST(-180 AS DOUBLE)", lohi="CAST(180 AS DOUBLE)",
        lalo="CAST(-90 AS DOUBLE)", lahi="CAST(90 AS DOUBLE)",
        bits="CAST(array() AS ARRAY<INT>)")
    return (
        f"aggregate(sequence(0, CAST({p} AS INT) * 5 - 1), {seed}, "
        f"(__g, __i) -> IF(__i % 2 = 0, "
        f"IF(CAST({lon} AS DOUBLE) >= (__g.lolo + __g.lohi) / 2, "
        f"{lon_hi}, {lon_lo}), "
        f"IF(CAST({lat} AS DOUBLE) >= (__g.lalo + __g.lahi) / 2, "
        f"{lat_hi}, {lat_lo})), "
        f"__g -> array_join(__xform__(sequence(1, CAST({p} AS INT)), "
        f"__c -> substring({_GEOHASH32}, aggregate(sequence(0, 4), 0, "
        f"(__a, __b) -> __a * 2 + element_at(__g.bits, (__c - 1) * 5 "
        f"+ __b + 1)) + 1, 1)), ''))"
    )


EXT_WRAPS.update({
    "arraySort": _array_sort_k(False),
    "arrayReverseSort": _array_sort_k(True),
    "arrayFill": _array_fill(False),
    "arrayReverseFill": _array_fill(True),
    "arraySplit": _array_split,
    "arrayProduct": _array_product,
    "arrayAUC": _array_auc,
    "hasSubstr": _has_substr,
    "range": _range,
    "L1Norm": _vec_norm("L1"),
    "L2Norm": _vec_norm("L2"),
    "L2SquaredNorm": _vec_norm("L2Squared"),
    "LinfNorm": _vec_norm("Linf"),
    "L1Normalize": _vec_normalize("L1"),
    "L2Normalize": _vec_normalize("L2"),
    "LinfNormalize": _vec_normalize("Linf"),
    "mapAdd": _map_addsub("add"),
    "mapSubtract": _map_addsub("sub"),
    "JSONExtractRaw": _json_extract_raw,
    "JSONExtractArrayRaw": _json_extract_array_raw,
    "JSON_QUERY": _json_query,
    "JSON_EXISTS": _json_exists,
    "simpleJSONExtractString": _simple_json("string"),
    "simpleJSONExtractInt": _simple_json("int"),
    "simpleJSONExtractFloat": _simple_json("float"),
    "simpleJSONExtractBool": _simple_json("bool"),
    "simpleJSONExtractRaw": _simple_json("raw"),
    "simpleJSONHas": _simple_json("has"),
    "visitParamExtractString": _simple_json("string"),
    "visitParamExtractInt": _simple_json("int"),
    "visitParamExtractFloat": _simple_json("float"),
    "visitParamExtractBool": _simple_json("bool"),
    "visitParamExtractRaw": _simple_json("raw"),
    "visitParamHas": _simple_json("has"),
    "domain": _url_domain,
    "domainWithoutWWWRFC": _url_domain,
    "topLevelDomain": _url_tld,
    "path": _url_path(False),
    "pathFull": _url_path(True),
    "extractURLParameter": _url_param,
    "extractURLParameters": _url_params,
    "extractURLParameterNames": _url_param_names,
    "cutWWW": _cut_www,
    "firstSignificantSubdomain": _first_significant_subdomain,
    "cutToFirstSignificantSubdomain": _cut_to_first_significant_subdomain,
    "netloc": _netloc,
    "encodeURLComponent": _encode_url_component,
    "IPv4StringToNumOrNull": _ipv4_string_to_num_or(None),
    "IPv4StringToNumOrDefault": _ipv4_string_to_num_or("CAST(0 AS BIGINT)"),
    "isIPv4String": _is_ipv4_string,
    "isIPv6String": _is_ipv6_string,
    "IPv4CIDRToRange": _ipv4_cidr_to_range,
    "isIPAddressInRange": _is_ip_address_in_range,
    "toIPv4": _to_ipv4(False),
    "toIPv4OrNull": _to_ipv4(True),
    "pointInPolygon": _point_in_polygon,
    "geohashEncode": _geohash_encode,
})


# ----------------------------------------------------- parameterized aggs
EXT_PARAM_AGGS: dict = {}
