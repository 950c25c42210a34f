"""ClickHouse → Spark SQL dialect translation.

The reference's entire query surface is ClickHouse SQL typed by its
users (/root/reference/README.md:29-52); this module lets those
queries run on the engine unchanged: ``Engine.sql(q,
dialect="clickhouse")`` translates the documented subset below and
hands the result to Spark SQL.

Translation is deliberately conservative and *lexical*: the query is
split into quoted-string / identifier-quote / code segments first, so
rewrites never touch string literals or backquoted identifiers, and
every function rewrite is either a pure name swap or a
paren-matched argument rewrap — no grammar, no guessing.

Supported rewrites:

* name swaps   — ``uniq``→``approx_count_distinct``,
  ``countIf``→``count_if``, ``has``→``array_contains``,
  ``indexOf``→``array_position``, ``arrayElement``→``element_at``,
  ``groupArray``→``collect_list``, ``groupUniqArray``→``collect_set``,
  ``arrayStringConcat``→``array_join``, ``any``→``any_value``,
  ``today()``/``yesterday()`` zero-arg forms.
* type casts   — ``toInt8/16/32/64``, ``toUInt*`` (widened),
  ``toFloat32/64``, ``toString``, ``toDate`` → ``CAST(x AS t)``.
* ``toDateTime(x)`` — the reference's own coercion rule
  (db/operations.go:169-176): integer strings parse as Unix seconds,
  anything else casts to timestamp.
* ``-If`` combinators — ``sumIf/avgIf/minIf/maxIf/uniqIf/
  uniqExactIf(x, cond)`` → ``agg(CASE WHEN cond THEN x END)``
  (top-level comma split inside the matched parens).
* parameterized aggregates — ``quantile(p)(x)`` /
  ``quantileExact(p)(x)`` / ``quantiles(p1, p2)(x)`` /
  ``quantilesExact(...)(x)`` → ``percentile_approx`` / ``percentile``
  with the params folded into the argument list (array for the
  plural forms).
* ``argMax/argMin(arg, val)`` → ``max_by/min_by`` (identical order).
* ``FROM t FINAL`` — resolvable at the ENGINE level:
  ``Engine.sql(dialect="clickhouse")`` rewrites known ingested tables
  to their version-collapsed views via :func:`rewrite_final_tables`;
  a bare translation (no engine) still raises with that pointer.
* ``toYYYYMM(d)`` → ``CAST(date_format(d, 'yyyyMM') AS INT)``;
  ``uniqExact(x)`` → ``count(DISTINCT x)``;
  ``multiIf(c1, v1, ..., e)`` → the equivalent ``CASE`` chain;
  higher-order ``arrayMap/Filter/Exists/All/Count/Sum(x -> e, arr)``
  → Spark's collection-first ``transform/filter/exists/forall/...``.
* ``numbers(N)`` table function → ``(SELECT id AS number FROM
  range(N))``.
* ``LIMIT [o,] n BY exprs`` → a ``row_number()`` window ≤ n over the
  wrapped query (see :func:`_rewrite_limit_by` for the documented
  limits).
* ``GROUP BY k WITH TOTALS`` → ``GROUP BY GROUPING SETS ((k), ())``
  (totals-row keys are NULL; raises when combined with HAVING, whose
  ClickHouse semantics depend on ``totals_mode``).
* a trailing ``FORMAT <name>`` clause is stripped (output formatting
  is the client's job in Spark).
* round-5 batch — ``stddevPop/stddevSamp/varPop/varSamp/skewPop``
  name swaps (+ ``kurtPop`` → ``kurtosis + 3``: Spark's kurtosis is
  EXCESS), ``toStartOfMinute/Hour/Day/Month/Quarter/Year``/
  ``toMonday`` → ``date_trunc``, boundary-crossing ``dateDiff`` →
  ``timestampdiff`` over unit-truncated ends, ``arrayCumSum``/
  ``arrayDifference``/``arrayCompact``/``arrayAvg``/``arrayMin``/
  ``arrayMax``/``arrayFlatten``, ``notEmpty``/``empty``; ClickHouse
  ``[a, b, c]`` array literals → ``array(a, b, c)``; and subscripts
  ``x[i]`` → ``element_at(x, i)`` preserving ClickHouse's 1-BASED,
  negative-from-end indexing (Spark's own ``[]`` is 0-based — a
  silent off-by-one if passed through).

Known lexical limits (documented, raise-or-passthrough rather than
guess): ``any(``/``match(``/``position(`` swap by NAME, so a
lower-case standard-SQL ``= any(SELECT ...)`` quantified comparison
would mistranslate — ClickHouse queries use ``IN``, and the upper-case
forms pass through untouched.

Anything outside this list passes through verbatim — Spark SQL
already accepts a large shared core (SELECT/JOIN/GROUP BY/window
functions/CTEs), which is why a lexical shim is enough for the
reference's documented workloads.
"""

from __future__ import annotations

import contextvars
import re

from substreams_sink_clickhouse_spark.functions.dialect_ext import (
    EXT_NAME_SWAPS,
    EXT_PARAM_AGGS,
    EXT_WRAPS,
    int_div_expr as _int_div_expr,
)

#: Sentinel -> real spelling, restored once at the END of the
#: rescan-until-stable loop.  A handler whose replacement must contain
#: a name the wraps pattern itself matches (transform, extract, CAST,
#: range, char, rand/randn) emits the sentinel instead — re-emitting
#: the real name would either re-trigger its ClickHouse handler
#: (corrupting the output) or loop forever.
_SENTINELS = {
    "__xform__(": "transform(",
    "__sql_extract__(": "extract(",
    "__sql_cast__(": "CAST(",
    "__tbl_range__(": "range(",
    "__chr__(": "char(",
    "__rand__(": "rand(",
    "__randn__(": "randn(",
}

#: name -> replacement, applied on word boundaries followed by ``(``.
_NAME_SWAPS = {
    "uniq": "approx_count_distinct",
    "countIf": "count_if",
    "groupArray": "collect_list",
    "groupUniqArray": "collect_set",
    "arrayStringConcat": "array_join",
    "any": "any_value",
    "anyLast": "any_value",
    "ifNull": "coalesce",
    "lengthUTF8": "length",
    "lowerUTF8": "lower",
    "upperUTF8": "upper",
    "position": "instr",
    "match": "rlike",
    "has": "array_contains",
    # argMax/argMin(arg, val) -> max_by/min_by(x, y): identical
    # argument order and semantics (value of ``arg`` at the max/min
    # ``val``); the most-used ClickHouse aggregates after sum/count.
    "argMax": "max_by",
    "argMin": "min_by",
    "indexOf": "array_position",
    "arrayElement": "element_at",
    "arrayConcat": "concat",
    # arraySort/arrayReverseSort live in EXT_WRAPS (keyed-lambda form)
    "arrayDistinct": "array_distinct",
    "arrayReverse": "reverse",
    "assumeNotNull": "coalesce",
    "toUnixTimestamp": "unix_timestamp",
    "stddevPop": "stddev_pop",
    "stddevSamp": "stddev_samp",
    "varPop": "var_pop",
    "varSamp": "var_samp",
    # ClickHouse skewPop = μ3/σ³ — exactly Spark's (uncorrected)
    # ``skewness``; kurtPop needs the +3 wrap (see _rewrite_wraps).
    "skewPop": "skewness",
    "arrayMin": "array_min",
    "arrayMax": "array_max",
    "arrayFlatten": "flatten",
    # approximate-distinct sketch variants: all map to Spark's HLL++
    # (different sketches, same contract — approximate distinct count)
    "uniqCombined": "approx_count_distinct",
    "uniqCombined64": "approx_count_distinct",
    "uniqHLL12": "approx_count_distinct",
    "uniqTheta": "approx_count_distinct",
    #: function-form arrayJoin (row expansion) == explode; the clause
    #: form ``ARRAY JOIN`` is handled separately in _rewrite_clauses
    "arrayJoin": "explode",
    # string batch 2 — same argument order and semantics
    "substringUTF8": "substring",
    "translateUTF8": "translate",
    "reverseUTF8": "reverse",
    "concatWithSeparator": "concat_ws",
    "startsWith": "startswith",
    "endsWith": "endswith",
    "trimLeft": "ltrim",
    "trimRight": "rtrim",
    "trimBoth": "trim",
    "bitCount": "bit_count",
    "arrayZip": "arrays_zip",
    "mapKeys": "map_keys",
    "mapValues": "map_values",
    "mapContains": "map_contains_key",
    # datetime accessors (identical semantics; toDayOfWeek needs the
    # Monday-first wrap below)
    "toYear": "year",
    "toMonth": "month",
    "toQuarter": "quarter",
    "toDayOfMonth": "dayofmonth",
    "toDayOfYear": "dayofyear",
    "toHour": "hour",
    "toMinute": "minute",
    "toSecond": "second",
    "toLastDayOfMonth": "last_day",
    "covarPop": "covar_pop",
    "covarSamp": "covar_samp",
    "roundBankers": "bround",
    # round-6 batch: same argument order and semantics
    "groupBitAnd": "bit_and",
    "groupBitOr": "bit_or",
    "groupBitXor": "bit_xor",
    "replaceAll": "replace",
    "leftPad": "lpad",
    "rightPad": "rpad",
    "base64Encode": "base64",
    # ClickHouse returns DateTime; Spark's from_unixtime returns a
    # STRING, so the correct target is timestamp_seconds
    "fromUnixTimestamp": "timestamp_seconds",
    "mapFromArrays": "map_from_arrays",
    "toTypeName": "typeof",
    # round-7 batch: same argument order and semantics
    "editDistance": "levenshtein",
    "levenshteinDistance": "levenshtein",
    # identical semantics inside an explicit frame; Spark's lag/lead
    # ignore the frame exactly the way ClickHouse's *InFrame respect
    # it only when one is declared — same (x[, n[, default]]) shape
    "lagInFrame": "lag",
    "leadInFrame": "lead",
    "fromUnixTimestamp64Milli": "timestamp_millis",
    "fromUnixTimestamp64Micro": "timestamp_micros",
}
_NAME_SWAPS.update(EXT_NAME_SWAPS)

#: toStartOf<Unit>(x) -> date_trunc('<unit>', x).  toMonday is the
#: Monday-start week truncation (date_trunc's week IS Monday-start);
#: toStartOfWeek is intentionally ABSENT — its default mode 0 starts
#: weeks on Sunday, which date_trunc cannot express.
_TRUNC_FUNCS = {
    "toStartOfSecond": "SECOND",
    "toStartOfMinute": "MINUTE",
    "toStartOfHour": "HOUR",
    "toStartOfDay": "DAY",
    "toStartOfMonth": "MONTH",
    "toStartOfQuarter": "QUARTER",
    "toStartOfYear": "YEAR",
    "toMonday": "WEEK",
}

#: ClickHouse add<Unit>/subtract<Unit>(ts, n) -> timestampadd
_DT_ARITH = {
    "addYears": ("YEAR", False),
    "subtractYears": ("YEAR", True),
    "addMonths": ("MONTH", False),
    "subtractMonths": ("MONTH", True),
    "addWeeks": ("WEEK", False),
    "subtractWeeks": ("WEEK", True),
    "addDays": ("DAY", False),
    "subtractDays": ("DAY", True),
    "addHours": ("HOUR", False),
    "subtractHours": ("HOUR", True),
    "addMinutes": ("MINUTE", False),
    "subtractMinutes": ("MINUTE", True),
    "addSeconds": ("SECOND", False),
    "subtractSeconds": ("SECOND", True),
    "addQuarters": ("QUARTER", False),
    "subtractQuarters": ("QUARTER", True),
}

#: dateDiff units ClickHouse and Spark timestampdiff share.
_DATEDIFF_UNITS = {
    "second", "minute", "hour", "day", "week", "month", "quarter", "year",
}

#: zero-argument forms (replaced including their parens).
_ZERO_ARG = {
    "today()": "current_date()",
    "yesterday()": "date_sub(current_date(), 1)",
    "now()": "current_timestamp()",
    "timezone()": "current_timezone()",
    "serverTimezone()": "current_timezone()",
}

#: func -> CAST target for the to<Type> family.
_CAST_FUNCS = {
    "toInt8": "TINYINT",
    "toInt16": "SMALLINT",
    "toInt32": "INT",
    "toInt64": "BIGINT",
    "toUInt8": "SMALLINT",
    "toUInt16": "INT",
    "toUInt32": "BIGINT",
    "toUInt64": "DECIMAL(20,0)",
    "toFloat32": "FLOAT",
    "toFloat64": "DOUBLE",
    "toString": "STRING",
    "toDate": "DATE",
}

#: to<T>OrNull / to<T>OrZero — ClickHouse's non-throwing conversions.
#: Spark 4 runs ANSI mode, where a plain CAST throws on malformed
#: input, so these map to TRY_CAST (NULL on failure); OrZero fills the
#: type's default (0 / epoch), matching ClickHouse.
_OR_CASTS: dict[str, tuple[str, str]] = {}
for _base, _t in _CAST_FUNCS.items():
    if _base == "toString":
        continue
    _OR_CASTS[_base + "OrNull"] = ("null", _t)
    _OR_CASTS[_base + "OrZero"] = ("zero", _t)
del _base, _t

#: -If aggregate combinators: agg(x, cond) -> agg(CASE WHEN cond THEN x END)
_IF_COMBINATORS = {
    "sumIf": "sum",
    "avgIf": "avg",
    "minIf": "min",
    "maxIf": "max",
    "uniqIf": "approx_count_distinct",
    "uniqExactIf": "__count_distinct__",
}

#: Parameterized aggregates ``name(params)(args)`` — ClickHouse's
#: two-paren-group syntax.  value = (spark_name, params_as_array):
#: ``quantile(0.9)(x)`` -> ``percentile_approx(x, 0.9)``;
#: ``quantilesExact(0.5, 0.9)(x)`` -> ``percentile(x, array(0.5, 0.9))``.
#: Documented DEVIATION: ClickHouse's quantileExact is nearest-rank
#: (always returns an element of the set); Spark's exact ``percentile``
#: linearly interpolates — identical on odd counts, differing on even
#: ([1,2] median: CH 2, here 1.5).  For element semantics use the
#: quantileExactLow/High operator shapes (q126).
_PARAM_AGGS = {
    "quantile": ("percentile_approx", False),
    "quantileTDigest": ("percentile_approx", False),
    "quantileExact": ("percentile", False),
    "quantiles": ("percentile_approx", True),
    "quantilesExact": ("percentile", True),
    # weighted exact quantile: Spark's percentile takes an integral
    # frequency column — argument order reshuffled in the rewriter
    "quantileExactWeighted": ("__weighted__", False),
    "topK": None,  # special-cased: frequency top-k, see _topk_expr
    "topKWeighted": None,  # special-cased: weight-sum top-k
}


def _map_apply_expr(lam: str, m: str) -> str:
    """Rewrite ``mapApply((k, v) -> (kexpr, vexpr), m)`` to a Spark
    entries round-trip: ``map_from_entries(transform(map_entries(m),
    __e -> struct(kexpr', vexpr')))`` where the lambda variables are
    substituted with ``__e.key`` / ``__e.value``.  Only the literal
    two-variable tuple-returning form is supported (ClickHouse's
    documented shape); the substitution is word-boundary on MASKED
    text, so identifiers inside string literals are never touched."""
    head, arrow, body = lam.partition("->")
    if not arrow:
        raise ValueError("mapApply needs a (k, v) -> (kexpr, vexpr) lambda")
    kvars = [v.strip() for v in head.strip().strip("()").split(",")]
    if len(kvars) != 2 or not all(v.isidentifier() for v in kvars):
        raise ValueError("mapApply lambda must name exactly (key, value)")
    body = body.strip()
    if not (body.startswith("(") and _match_paren(body, 0) == len(body) - 1):
        raise ValueError("mapApply lambda must return a (kexpr, vexpr) tuple")
    parts = _split_top_commas(body[1:-1])
    if len(parts) != 2:
        raise ValueError("mapApply lambda must return a (kexpr, vexpr) tuple")
    kexpr, vexpr = parts
    # refuse if a NESTED lambda rebinds one of the outer variables —
    # the textual substitution below would corrupt the inner binding
    for m_ in re.finditer(r"(?:\(([^()]*)\)|(\w+))\s*->", kexpr + "," + vexpr):
        inner = [p.strip() for p in (m_.group(1) or m_.group(2)).split(",")]
        if any(v in inner for v in kvars):
            raise ValueError(
                "mapApply lambda body rebinds the outer variable in a "
                "nested lambda — rename the inner lambda's parameter"
            )
    for var, repl in zip(kvars, ("__e.key", "__e.value")):
        kexpr = re.sub(rf"\b{re.escape(var)}\b", repl, kexpr)
        vexpr = re.sub(rf"\b{re.escape(var)}\b", repl, vexpr)
    return (
        f"map_from_entries(transform(map_entries({m}), "
        f"__e -> struct({kexpr}, {vexpr})))"
    )


def _topk_weighted_expr(x: str, wgt: str, k: str) -> str:
    """Exact rewrite of ``topKWeighted(k)(x, w)``: the k values with
    the largest WEIGHT SUMS (ClickHouse's sketch made exact — a
    superset guarantee, same stance as _topk_expr), ties broken by
    value.  The weight fold is integer-exact on BIGINT — ClickHouse
    declares the weight UInt64, so integral weights are the contract
    (fractional weights raise in Spark's analyzer, not silently
    round).  Same let-binding trick: the group's (value, weight) list
    aggregates ONCE; per-distinct-value weight sums are O(n) filters
    over it — fine at sane group cardinalities, same trade as topK."""
    return (
        f"transform(array(collect_list(named_struct('k', {x}, 'wt', {wgt}))), "
        f"__l -> slice(transform(array_sort("
        f"transform(array_distinct(transform(__l, __e -> __e.k)), __v -> "
        f"struct(aggregate(filter(__l, __y -> __y.k = __v), "
        f"CAST(0 AS BIGINT), (__a, __y) -> __a + __y.wt) AS c, __v AS k)), "
        f"(a, b) -> CASE WHEN a.c > b.c THEN -1 WHEN a.c < b.c THEN 1 "
        f"WHEN a.k < b.k THEN -1 WHEN a.k > b.k THEN 1 ELSE 0 END), "
        f"__e -> __e.k), 1, {k}))[0]"
    )


def _topk_expr(args: str, k: str) -> str:
    """Exact rewrite of ``topK(k)(x)``: array of the k most frequent
    values, ties broken by value (deterministic, unlike ClickHouse's
    approximate sketch — a superset guarantee).  The outer
    ``transform(array(collect_list(x)), l -> ...)[0]`` is a lambda
    let-binding: the group's list is aggregated ONCE and reused for
    both the distinct pass and the per-value counts.  Per-group cost
    is O(distinct * n) — fine for topK's usual low-cardinality
    targets; for high-cardinality frequency ranking use the
    pre-aggregated-counts operator shape (q57_topk_weighted) instead."""
    return (
        f"transform(array(collect_list({args})), l -> "
        f"slice(transform(array_sort("
        f"transform(array_distinct(l), v -> "
        f"struct(size(filter(l, y -> y = v)) AS c, v AS k)), "
        f"(a, b) -> CASE WHEN a.c > b.c THEN -1 WHEN a.c < b.c THEN 1 "
        f"WHEN a.k < b.k THEN -1 WHEN a.k > b.k THEN 1 ELSE 0 END), "
        f"e -> e.k), 1, {k}))[0]"
    )

#: higher-order array functions: ClickHouse takes the lambda FIRST
#: (``arrayMap(x -> e, arr)``); Spark takes the collection first.
#: value is (spark_name, wrap) where wrap='count' renders
#: ``size(filter(arr, f))``.
_HOF_SWAP = {
    "arrayMap": "transform",
    "arrayFilter": "filter",
    "arrayExists": "exists",
    "arrayAll": "forall",
    "arrayCount": "__count__",
    "arraySum": "__sum__",
    # first/last match and their 1-based indexes.  DEVIATION: no match
    # yields NULL here where ClickHouse yields the element type's
    # default (0/''); the *Index forms return 0 on no-match exactly
    # like ClickHouse.  ``get()`` (never ``element_at``) keeps the
    # empty-filter case NULL instead of an ANSI-mode error.
    "arrayFirst": "__first__",
    "arrayLast": "__last__",
    "arrayFirstIndex": "__first_idx__",
    "arrayLastIndex": "__last_idx__",
}


def _segments(sql: str):
    """Yield (is_code, text) with single-quoted strings and backquoted
    identifiers kept opaque.  Quote escaping by doubling ('' / ``) is
    honored, as is C-style backslash escaping inside single-quoted
    literals (ClickHouse's default: ``'it\\'s'``) — a ``\\'`` must not
    terminate the literal early or the tail would be rewritten as
    code."""
    i, n = 0, len(sql)
    buf = []
    while i < n:
        ch = sql[i]
        if ch in ("'", "`"):
            if buf:
                yield True, "".join(buf)
                buf = []
            j = i + 1
            while j < n:
                if ch == "'" and sql[j] == "\\":  # C-style escape
                    j += 2
                    continue
                if sql[j] == ch:
                    if j + 1 < n and sql[j + 1] == ch:  # doubled quote
                        j += 2
                        continue
                    break
                j += 1
            yield False, sql[i : j + 1]
            i = j + 1
        else:
            buf.append(ch)
            i += 1
    if buf:
        yield True, "".join(buf)


def _match_paren(code: str, open_idx: int) -> int:
    """Index of the ``)`` matching ``(`` at open_idx (same segment)."""
    depth = 0
    for k in range(open_idx, len(code)):
        if code[k] == "(":
            depth += 1
        elif code[k] == ")":
            depth -= 1
            if depth == 0:
                return k
    raise ValueError("unbalanced parentheses in ClickHouse query")


def _split_top_commas(args: str) -> list[str]:
    """Split on commas at depth 0, where parens AND square brackets
    nest (ClickHouse array literals are ``[a, b, c]``)."""
    out, depth, start = [], 0, 0
    for k, ch in enumerate(args):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(args[start:k])
            start = k + 1
    out.append(args[start:])
    return [a.strip() for a in out]


#: Per-translation column-type context for default-fill inference
#: (set by ``clickhouse_to_spark_sql(column_types=...)``): plain
#: column name -> Spark DDL type string (e.g. "ARRAY<BIGINT>").
#: A ContextVar, not a module global: translation stays reentrant and
#: thread-safe (concurrent Engine.sql calls never see each other's
#: catalog context).
_COLUMN_TYPES: contextvars.ContextVar[dict[str, str] | None] = (
    contextvars.ContextVar("_COLUMN_TYPES", default=None)
)


def _element_default(elem_type: str) -> str | None:
    """Spark SQL literal for the ClickHouse DEFAULT of an element type
    (what the 2-arg arrayResize/shift forms pad with): 0 for integers,
    0.0 for floats, '' for strings, false for booleans, the epoch for
    date/time.  None = not a type we can default (caller raises)."""
    t = re.sub(r"\(.*\)", "", elem_type).strip().upper()
    return {
        "TINYINT": "CAST(0 AS TINYINT)",
        "SMALLINT": "CAST(0 AS SMALLINT)",
        "INT": "0",
        "INTEGER": "0",
        "BIGINT": "CAST(0 AS BIGINT)",
        "LONG": "CAST(0 AS BIGINT)",
        "FLOAT": "CAST(0 AS FLOAT)",
        "REAL": "CAST(0 AS FLOAT)",
        "DOUBLE": "CAST(0 AS DOUBLE)",
        "DECIMAL": "CAST(0 AS DOUBLE)",
        "STRING": "''",
        "VARCHAR": "''",
        "CHAR": "''",
        "BOOLEAN": "false",
        "DATE": "DATE '1970-01-01'",
        "TIMESTAMP": "TIMESTAMP '1970-01-01 00:00:00'",
    }.get(t)


def _infer_array_fill(arr: str) -> str | None:
    """Infer the pad element for a 2-arg arrayResize/arrayShift* call:
    from the first element of an array LITERAL (``[..]`` pre-rewrite
    or ``array(..)`` post-rewrite; string literals arrive masked as
    sentinels), or from :data:`_COLUMN_TYPES` for a plain column.
    None when the expression is opaque."""
    s = arr.strip()
    m = re.fullmatch(r"(?:\[|array\s*\()\s*(.*?)\s*[\])]", s,
                     flags=re.IGNORECASE | re.DOTALL)
    if m:
        if not m.group(1):
            return None  # empty literal: element type unknowable
        first = _split_top_commas(m.group(1))[0].strip()
        if re.fullmatch(r"[+-]?\d+", first):
            return "0"
        if re.fullmatch(r"[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?",
                        first):
            return "CAST(0 AS DOUBLE)"
        if re.fullmatch(r"\x01\d+\x01", first):
            return "''"  # masked string literal
        return None
    column_types = _COLUMN_TYPES.get()
    if re.fullmatch(r"`?\w+`?", s) and column_types:
        t = column_types.get(s.strip("`"))
        if t:
            m2 = re.fullmatch(r"\s*ARRAY\s*<\s*(.+)\s*>\s*", t,
                              flags=re.IGNORECASE | re.DOTALL)
            if m2:
                return _element_default(m2.group(1))
    return None


def _rewrite_array_literals(code: str) -> str:
    """ClickHouse array literals ``[a, b, c]`` → ``array(a, b, c)``.

    Lexical disambiguation from INDEXING (``a[1]``, ``m['k']``,
    ``f(x)[2]``): a ``[`` is an index access iff the preceding token
    can end a value — a non-keyword identifier, ``)``, ``]``, or a
    masked-literal sentinel; anything else (start of expression,
    ``(``, ``,``, an operator, or an SQL keyword like SELECT/WHEN/
    THEN/AND) starts a literal.  Nested content is rewritten
    recursively either way.

    Index accesses are rewritten to ``element_at(base, idx)`` —
    ClickHouse subscripts are 1-BASED with negative-from-the-end,
    which is exactly ``element_at``'s contract, while Spark's own
    ``[]`` subscript is 0-based: passing the text through unchanged
    would silently shift every element access by one.  The base
    expression (identifier chain, call result, prior subscript, or
    masked literal) is located by scanning the emitted text
    backwards."""
    kw = {
        "SELECT", "WHERE", "WHEN", "THEN", "ELSE", "AND", "OR", "NOT",
        "IN", "AS", "BY", "ON", "CASE", "DISTINCT", "ALL", "UNION",
        "EXCEPT", "INTERSECT", "HAVING", "LIKE", "BETWEEN", "IS",
        "RETURN", "VALUES", "FROM",
    }
    out: list[str] = []
    i, n = 0, len(code)
    while i < n:
        ch = code[i]
        if ch == "[":
            j = i - 1
            while j >= 0 and code[j].isspace():
                j -= 1
            prev = code[j] if j >= 0 else ""
            if prev.isalnum() or prev == "_":
                w = j
                while w >= 0 and (code[w].isalnum() or code[w] == "_"):
                    w -= 1
                word = code[w + 1 : j + 1]
                is_index = word.upper() not in kw
            else:
                # bool(prev) guard: at string start prev is "" and
                # Python's ``"" in s`` is always True — without it a
                # LEADING array literal (``[[1, 2], [3]]`` as the first
                # argument) would be misread as an index access with an
                # empty base expression
                is_index = bool(prev) and prev in ")]\x01`"
            depth = 0
            k = i
            while k < n:
                if code[k] == "[":
                    depth += 1
                elif code[k] == "]":
                    depth -= 1
                    if depth == 0:
                        break
                k += 1
            if depth != 0:
                raise ValueError("unbalanced square brackets in ClickHouse query")
            inner = _rewrite_array_literals(code[i + 1 : k])
            if is_index:
                # locate the base expression's start in the emitted text
                emitted = "".join(out)
                b = len(emitted)
                while b > 0 and emitted[b - 1].isspace():
                    b -= 1
                end = b
                while b > 0:
                    c = emitted[b - 1]
                    if c in ")]":
                        depth2 = 0
                        while b > 0:
                            c2 = emitted[b - 1]
                            if c2 in ")]":
                                depth2 += 1
                            elif c2 in "([":
                                depth2 -= 1
                            b -= 1
                            if depth2 == 0:
                                break
                    elif c.isalnum() or c in "_.\x01":
                        b -= 1
                    else:
                        break
                base = emitted[b:end]
                out = [emitted[:b], f"element_at({base}, {inner})", emitted[end:]]
            else:
                out.append(f"array({inner})")
            i = k + 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _rewrite_wraps(code: str, literals: tuple = (), _top: bool = True) -> str:
    """Paren-matched rewrites (casts, -If combinators, toYYYYMM,
    numbers) applied innermost-last by rescanning until stable.
    ``literals`` is the translator's masked-literal table — needed by
    rewrites whose SEMANTICS depend on a string argument (dateDiff's
    unit), since literals are sentinels at this stage."""
    # the ~450-alternative pattern is compiled once per process: this
    # function recurses per nested paren group, and a per-call compile
    # of a multi-KB alternation was measurable translation latency
    global _WRAPS_PAT
    if _WRAPS_PAT is None:
        _WRAPS_PAT = _build_wraps_pat()
    pat = _WRAPS_PAT
    if _top:
        # CAST is a case-insensitive KEYWORD in ClickHouse, so
        # cast(x, 'Int64') is valid input, but the wraps alternation is
        # case-sensitive and would pass it through untranslated
        # (round-7 advisory).  Canonicalize before scanning: literals
        # are already masked at this stage, so string contents can't be
        # touched, and \b keeps identifiers like broadcast( intact.
        code = re.sub(r"\b[cC][aA][sS][tT](?=\s*\()", "CAST", code)
    return _run_wraps(pat, code, literals, _top)


_WRAPS_PAT = None


def _build_wraps_pat():
    return re.compile(
        r"\b(" + "|".join(
            list(_CAST_FUNCS)
            + list(_IF_COMBINATORS)
            + list(_HOF_SWAP)
            + list(_TRUNC_FUNCS)
            + [
                "toDateTime", "toYYYYMM", "numbers", "uniqExact", "multiIf",
                "kurtPop", "arrayAvg", "arrayCumSum", "arrayCompact",
                "arrayDifference", "dateDiff", "notEmpty", "empty",
                "median", "medianExact", "arrayUniq", "countEqual",
                "intDiv", "modulo", "transform", "arrayFold",
                "toStartOfInterval", "arrayPushBack", "arrayPushFront",
                "arrayPopBack", "arrayPopFront", "arrayRotateLeft",
                "arrayRotateRight", "arrayResize", "arrayShiftLeft",
                "arrayShiftRight", "arrayStringConcat", "countSubstrings",
                "positionCaseInsensitive", "splitByChar", "splitByString",
                "bitAnd", "bitOr", "bitXor", "bitNot", "bitShiftLeft",
                "bitShiftRight", "arrayIntersect", "hasAll", "hasAny",
                "formatReadableSize", "formatReadableQuantity",
                "toDayOfWeek", "toYYYYMMDD", "toRelativeSecondNum",
                "toRelativeMinuteNum", "toRelativeHourNum",
                "toRelativeDayNum",
                "age", "regexpExtract", "countMatches", "splitByRegexp",
                "tupleElement", "tuple", "toStartOfFiveMinutes",
                "toStartOfTenMinutes", "toStartOfFifteenMinutes",
                "timeSlot", "monthName", "toISOWeek", "toISOYear",
                "IPv4NumToString", "IPv4StringToNum", "roundDown",
                "roundAge", "roundDuration", "roundToExp2",
                "arrayDotProduct", "dotProduct", "L1Distance",
                "L2Distance", "L2SquaredDistance", "LinfDistance",
                "cosineDistance", "cutQueryString", "cutFragment",
                "cutQueryStringAndFragment", "queryString", "fragment",
                "decodeURLComponent", "domainWithoutWWW", "protocol",
                "JSONExtractInt", "JSONExtractString",
                "JSONExtractFloat", "JSONExtractBool", "JSONHas",
                "JSONExtractKeys", "JSONLength", "isValidJSON",
                "replaceOne", "replaceRegexpAll", "extractAll", "extract",
                "arraySlice", "arrayEnumerate", "base64Decode",
                "isNaN", "isFinite", "isInfinite",
                "dateAdd", "dateSub",
                "splitByWhitespace", "ifNotFinite", "bitTest",
                "arrayReduce",
                # round-7 batch
                "arrayJaccardIndex", "ngrams", "tokens",
                "multiSearchFirstIndex", "mapFilter", "mapApply",
                "mapUpdate", "simpleLinearRegression", "entropy",
                "arrayEnumerateUniq", "toDecimalString",
                "arrayPartialSort", "arrayPartialReverseSort",
                "sumArray", "minArray", "maxArray", "avgArray",
                "countArray", "groupArrayArray", "sumDistinct",
                "avgDistinct", "CAST", "accurateCast",
                "accurateCastOrNull", "toIntervalSecond",
                "toIntervalMinute", "toIntervalHour", "toIntervalDay",
                "toIntervalWeek", "toIntervalMonth", "toIntervalQuarter",
                "toIntervalYear",
                "greatCircleDistance", "toUnixTimestamp64Milli",
                "toUnixTimestamp64Micro",
            ] + list(_DT_ARITH) + list(_OR_CASTS) + list(EXT_WRAPS)
        ) + r")\s*\("
    )


def _run_wraps(pat, code: str, literals: tuple, _top: bool) -> str:
    # Rescan-until-stable can only terminate if no replacement re-emits
    # a matched name (dialect_ext handlers use the sentinel table for
    # collisions); the iteration cap turns a handler that violates that
    # contract into an error instead of a hang.
    guard = 0
    while True:
        guard += 1
        if guard > 10_000:
            raise ValueError(
                "dialect rewrite did not converge - a handler re-emits "
                "its own (or another handled) function name"
            )
        m = pat.search(code)
        if not m:
            # Sentinels restore at the TOP level only: a nested call
            # returns into an enclosing handler's argument list, and
            # restoring there would hand the real name (transform,
            # rand, ...) back to the outer rescan loop — which would
            # re-rewrite it as its ClickHouse namesake (mangling) or
            # loop forever (the rand()-inside-CAST case).
            if _top:
                for sent, real in _SENTINELS.items():
                    code = code.replace(sent, real)
            return code
        name = m.group(1)
        op = code.index("(", m.end(1))
        cp = _match_paren(code, op)
        inner = _rewrite_wraps(code[op + 1 : cp], literals, _top=False)
        if name in _CAST_FUNCS:
            repl = f"CAST({inner} AS {_CAST_FUNCS[name]})"
        elif name in _IF_COMBINATORS:
            x, cond = _split_top_commas(inner)
            agg = _IF_COMBINATORS[name]
            if agg == "__count_distinct__":
                repl = f"count(DISTINCT CASE WHEN {cond} THEN {x} END)"
            else:
                repl = f"{agg}(CASE WHEN {cond} THEN {x} END)"
        elif name == "toDateTime":
            # TRY_CAST in the numeric branch: Catalyst's constant
            # folding (SpecialDatetimeValues) evaluates a literal
            # CAST(x AS BIGINT) EAGERLY even when the CASE can never
            # take that branch, so toDateTime('2024-01-31 00:00:00')
            # with a plain CAST throws at optimize time under ANSI
            repl = (
                f"(CASE WHEN CAST({inner} AS STRING) RLIKE '^[0-9]+$' "
                f"THEN to_timestamp(from_unixtime(TRY_CAST({inner} AS BIGINT))) "
                f"ELSE CAST({inner} AS TIMESTAMP) END)"
            )
        elif name == "toYYYYMM":
            repl = f"CAST(date_format({inner}, 'yyyyMM') AS INT)"
        elif name == "uniqExact":
            repl = f"count(DISTINCT {inner})"
        elif name in _HOF_SWAP:
            parts = _split_top_commas(inner)
            if name == "arraySum":
                # arraySum(arr) or arraySum(f, arr).  The 1-arg form
                # folds on the ELEMENT type's numeric width like
                # arrayReduce('sum') — ClickHouse sums Int* arrays to
                # Int64, and a DOUBLE result additionally breaks
                # integral consumers (intDiv(arraySum(a), n))
                if len(parts) == 1:
                    _seed = (
                        f"coalesce(try_element_at({parts[0]}, 1), 0)"
                        f" * CAST(0 AS BIGINT) * CAST(1 AS BIGINT)"
                    )
                    repl = f"aggregate({parts[0]}, {_seed}, (acc, x) -> acc + x)"
                else:
                    f_, arr = parts
                    var = f_.split("->", 1)[0].strip()
                    body = f_.split("->", 1)[1].strip()
                    repl = (
                        f"aggregate({arr}, CAST(0 AS DOUBLE), "
                        f"(acc, {var}) -> acc + ({body}))"
                    )
            else:
                if len(parts) != 2:
                    raise ValueError(f"{name} needs (lambda, array)")
                f_, arr = parts
                tgt = _HOF_SWAP[name]
                if tgt == "__count__":
                    repl = f"size(filter({arr}, {f_}))"
                elif tgt == "__first__":
                    repl = f"get(filter({arr}, {f_}), 0)"
                elif tgt == "__last__":
                    repl = f"get(reverse(filter({arr}, {f_})), 0)"
                elif tgt == "__first_idx__":
                    # 1-based index of the first match, 0 if none —
                    # exactly ClickHouse's contract
                    repl = (
                        f"coalesce(array_position(transform({arr}, {f_}),"
                        f" true), 0)"
                    )
                elif tgt == "__last_idx__":
                    # Spark's array_position yields 0 (not NULL) on no
                    # match, so gate on = 0
                    repl = (
                        f"(CASE WHEN array_position(reverse(transform("
                        f"{arr}, {f_})), true) = 0 THEN 0 "
                        f"ELSE size({arr}) + 1 - array_position(reverse("
                        f"transform({arr}, {f_})), true) END)"
                    )
                else:
                    repl = f"{tgt}({arr}, {f_})"
        elif name in ("arrayPushBack", "arrayPushFront"):
            arr, e = _split_top_commas(inner)
            repl = (
                f"concat({arr}, array({e}))"
                if name == "arrayPushBack"
                else f"concat(array({e}), {arr})"
            )
        elif name in ("arrayPopBack", "arrayPopFront"):
            start = "1" if name == "arrayPopBack" else "2"
            repl = f"slice({inner}, {start}, greatest(size({inner}) - 1, 0))"
        elif name in ("arrayRotateLeft", "arrayRotateRight"):
            arr, n_ = _split_top_commas(inner)
            shift = n_ if name == "arrayRotateLeft" else f"-({n_})"
            rot = f"pmod({shift}, size({arr}))"
            repl = (
                f"CASE WHEN size({arr}) <= 1 THEN {arr} ELSE "
                f"concat(slice({arr}, {rot} + 1, size({arr}) - {rot}), "
                f"slice({arr}, 1, {rot})) END"
            )
        elif name in ("arrayResize", "arrayShiftLeft", "arrayShiftRight"):
            parts = _split_top_commas(inner)
            if len(parts) == 2:
                # ClickHouse's 2-arg form pads with the element type's
                # DEFAULT.  The default IS inferable when the array is
                # a literal (element type known lexically) or a plain
                # column with a caller-supplied type (catalog lookup
                # via ``column_types=``); only opaque expressions keep
                # the explicit-fill raise (round-8 verdict ask #5).
                fill = _infer_array_fill(parts[0])
                if fill is None:
                    raise ValueError(
                        f"{name} needs an explicit fill element here "
                        f"({name}(arr, n, fill)) - ClickHouse's 2-arg "
                        "form pads with the array type's default, "
                        "which is only inferable for array literals "
                        "and cataloged columns (pass column_types= or "
                        "the fill element)"
                    )
                parts = [parts[0], parts[1], fill]
            if len(parts) != 3:
                raise ValueError(
                    f"{name} takes (arr, n[, fill]), got {len(parts)} args"
                )
            arr, n_, fill = parts
            if name == "arrayResize":
                repl = (
                    f"CASE WHEN ({n_}) <= size({arr}) THEN slice({arr}, 1, {n_}) "
                    f"ELSE concat({arr}, array_repeat({fill}, ({n_}) - size({arr}))) END"
                )
            elif name == "arrayShiftLeft":
                repl = (
                    f"concat(slice({arr}, ({n_}) + 1, greatest(size({arr}) - ({n_}), 0)), "
                    f"array_repeat({fill}, least({n_}, size({arr}))))"
                )
            else:
                repl = (
                    f"concat(array_repeat({fill}, least({n_}, size({arr}))), "
                    f"slice({arr}, 1, greatest(size({arr}) - ({n_}), 0)))"
                )
        elif name in _DT_ARITH:
            x, n_ = _split_top_commas(inner)
            unit, neg = _DT_ARITH[name]
            amt = f"-({n_})" if neg else n_
            repl = f"timestampadd({unit}, {amt}, {x})"
        elif name == "toDayOfWeek":
            # ClickHouse default mode 0: Monday=1..Sunday=7; Spark's
            # weekday() is Monday=0.  Mode table (docs): 1 Mon 0-6,
            # 2 Sun 1-7, 3 Sun 0-6.
            parts = _split_top_commas(inner)
            if len(parts) == 1:
                repl = f"(weekday({inner}) + 1)"
            else:
                d_, mode_ = parts[0], parts[1].strip()
                repl = {
                    "0": f"(weekday({d_}) + 1)",
                    "1": f"weekday({d_})",
                    "2": f"dayofweek({d_})",
                    "3": f"(dayofweek({d_}) - 1)",
                }.get(mode_)
                if repl is None:
                    raise ValueError(
                        "toDayOfWeek mode must be a literal 0..3"
                    )
        elif name == "toYYYYMMDD":
            repl = f"CAST(date_format({inner}, 'yyyyMMdd') AS INT)"
        elif name in ("toRelativeSecondNum", "toRelativeMinuteNum",
                      "toRelativeHourNum", "toRelativeDayNum"):
            div = {"toRelativeSecondNum": 1, "toRelativeMinuteNum": 60,
                   "toRelativeHourNum": 3600, "toRelativeDayNum": 86400}[name]
            repl = (
                f"CAST(floor(unix_timestamp({inner}) / {div}) AS BIGINT)"
                if div > 1
                else f"unix_timestamp({inner})"
            )
        elif name in ("formatReadableSize", "formatReadableQuantity"):
            # deterministic 2dp HALF-UP via integer arithmetic —
            # %.2f printf would tie-round differently across engines
            # (Java HALF_UP on the decimal expansion vs C round-to-
            # nearest-even on the binary double)
            if name == "formatReadableSize":
                units = ["B", "KiB", "MiB", "GiB", "TiB", "PiB", "EiB"]
                base = 1024.0
            else:
                units = ["", " thousand", " million", " billion", " trillion"]
                base = 1000.0
            x = inner
            whens = []
            for k, u in enumerate(units):
                div = base ** k
                cents = (
                    f"CAST(floor(abs(CAST({x} AS DOUBLE)) / {div} * 100.0"
                    f" + 0.5) AS BIGINT)"
                )
                rendered = (
                    f"concat(IF(({x}) < 0, '-', ''), "
                    f"CAST({cents} DIV 100 AS STRING), '.', "
                    f"lpad(CAST({cents} % 100 AS STRING), 2, '0'), '{u}')"
                )
                if name == "formatReadableSize":
                    rendered = rendered.replace(f"'{u}')", f"' {u}')")
                if k < len(units) - 1:
                    whens.append(
                        f"WHEN abs(CAST({x} AS DOUBLE)) < {base ** (k + 1)} "
                        f"THEN {rendered}"
                    )
                else:
                    whens.append(f"ELSE {rendered}")
            repl = "(CASE " + " ".join(whens) + " END)"
        elif name == "arrayIntersect":
            parts = _split_top_commas(inner)
            if len(parts) < 2:
                raise ValueError("arrayIntersect needs at least two arrays")
            repl = parts[0]
            for nxt in parts[1:]:
                repl = f"array_intersect({repl}, {nxt})"
        elif name in ("hasAll", "hasAny"):
            a, b = _split_top_commas(inner)
            repl = (
                f"(size(array_except({b}, {a})) = 0)"
                if name == "hasAll"
                else f"arrays_overlap({a}, {b})"
            )
        elif name in ("bitAnd", "bitOr", "bitXor"):
            a, b = _split_top_commas(inner)
            op_ = {"bitAnd": "&", "bitOr": "|", "bitXor": "^"}[name]
            repl = f"(({a}) {op_} ({b}))"
        elif name == "bitNot":
            repl = f"(~({inner}))"
        elif name in ("bitShiftLeft", "bitShiftRight"):
            a, b = _split_top_commas(inner)
            fn = "shiftleft" if name == "bitShiftLeft" else "shiftright"
            repl = f"{fn}({a}, CAST({b} AS INT))"
        elif name == "countSubstrings":
            h, nd = _split_top_commas(inner)
            # non-overlapping occurrence count by length arithmetic —
            # integer-exact, no regex involvement
            repl = (
                f"CAST((length({h}) - length(replace({h}, {nd}, ''))) "
                f"/ length({nd}) AS BIGINT)"
            )
        elif name == "positionCaseInsensitive":
            h, nd = _split_top_commas(inner)
            repl = f"instr(lower({h}), lower({nd}))"
        elif name in ("splitByChar", "splitByString"):
            sep, s = _split_top_commas(inner)
            # Spark's split takes a REGEX: \Q...\E quotes the separator
            # so metacharacters split literally, matching ClickHouse
            repl = f"split({s}, concat('\\\\Q', {sep}, '\\\\E'))"
        elif name == "arrayStringConcat":
            parts = _split_top_commas(inner)
            sep = parts[1] if len(parts) == 2 else "''"
            repl = f"array_join({parts[0]}, {sep})"
        elif name == "arrayFold":
            # arrayFold((acc, x) -> expr, arr, init) — Spark's aggregate
            # takes the same lambda syntax with reordered operands
            parts = _split_top_commas(inner)
            if len(parts) != 3:
                raise ValueError("arrayFold needs (lambda, array, init)")
            f_, arr, init = parts
            repl = f"aggregate({arr}, {init}, {f_})"
        elif name == "toStartOfInterval":
            parts = _split_top_commas(inner)
            if len(parts) != 2:
                raise ValueError("toStartOfInterval needs (time, INTERVAL n unit)")
            iv = re.fullmatch(
                r"INTERVAL\s+(\d+)\s+(SECOND|MINUTE|HOUR|DAY|MONTH)S?",
                parts[1].strip(),
                flags=re.IGNORECASE,
            )
            if iv is None:
                raise ValueError(
                    "toStartOfInterval supports INTERVAL n "
                    "SECOND/MINUTE/HOUR/DAY/MONTH (WEEK anchoring "
                    "differs; use toMonday for weeks)"
                )
            n_, unit = int(iv.group(1)), iv.group(2).upper()
            if unit == "MONTH":
                # n-month buckets anchored at 1970-01 (ClickHouse's
                # epoch anchor for month-granular intervals)
                repl = (
                    f"add_months(DATE '1970-01-01', CAST(floor(months_between("
                    f"{parts[0]}, TIMESTAMP '1970-01-01 00:00:00') / {n_}) "
                    f"* {n_} AS INT))"
                )
            else:
                secs = n_ * {"SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400}[unit]
                repl = (
                    f"timestamp_seconds(CAST(floor(unix_timestamp({parts[0]}) "
                    f"/ {secs}) * {secs} AS BIGINT))"
                )
        elif name in _TRUNC_FUNCS:
            repl = f"date_trunc('{_TRUNC_FUNCS[name]}', {inner})"
        elif name == "kurtPop":
            # ClickHouse kurtPop = μ4/σ⁴; Spark kurtosis is EXCESS
            # kurtosis (μ4/σ⁴ − 3)
            repl = f"(kurtosis({inner}) + 3)"
        elif name == "arrayAvg":
            repl = (
                f"(aggregate({inner}, CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
                f" / size({inner}))"
            )
        elif name == "arrayCumSum":
            # no scan primitive in Spark: per-position prefix aggregate
            # (O(n²) in element count — fine for the small arrays this
            # function is used on; result type widens to DOUBLE,
            # documented deviation)
            repl = (
                f"transform({inner}, (x, i) -> "
                f"aggregate(slice({inner}, 1, i + 1), CAST(0 AS DOUBLE), "
                f"(acc, y) -> acc + y))"
            )
        elif name == "arrayCompact":
            # drop CONSECUTIVE duplicates (null-safe comparison)
            repl = (
                f"filter({inner}, (x, i) -> i = 0 "
                f"OR NOT (x <=> element_at({inner}, i)))"
            )
        elif name == "arrayDifference":
            repl = (
                f"transform({inner}, (x, i) -> CASE WHEN i = 0 "
                f"THEN CAST(0 AS DOUBLE) "
                f"ELSE CAST(x AS DOUBLE) - CAST(element_at({inner}, i) AS DOUBLE) END)"
            )
        elif name in ("arrayDotProduct", "dotProduct", "L1Distance",
                      "L2Distance", "L2SquaredDistance", "LinfDistance",
                      "cosineDistance"):
            a, b = _split_top_commas(inner)
            dot = (
                f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE)"
                f" * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
            )
            sq = (
                f"aggregate(zip_with({a}, {b}, (x, y) -> (CAST(x AS DOUBLE)"
                f" - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS"
                f" DOUBLE))), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
            )
            if name in ("arrayDotProduct", "dotProduct"):
                repl = dot
            elif name == "L2SquaredDistance":
                repl = sq
            elif name == "L2Distance":
                repl = f"sqrt({sq})"
            elif name == "L1Distance":
                repl = (
                    f"aggregate(zip_with({a}, {b}, (x, y) -> abs(CAST(x AS"
                    f" DOUBLE) - CAST(y AS DOUBLE))), CAST(0 AS DOUBLE),"
                    f" (acc, v) -> acc + v)"
                )
            elif name == "LinfDistance":
                repl = (
                    f"array_max(zip_with({a}, {b}, (x, y) -> abs(CAST(x AS"
                    f" DOUBLE) - CAST(y AS DOUBLE))))"
                )
            else:  # cosineDistance
                na = (
                    f"sqrt(aggregate(transform({a}, x -> CAST(x AS DOUBLE)"
                    f" * CAST(x AS DOUBLE)), CAST(0 AS DOUBLE),"
                    f" (acc, v) -> acc + v))"
                )
                nb = (
                    f"sqrt(aggregate(transform({b}, x -> CAST(x AS DOUBLE)"
                    f" * CAST(x AS DOUBLE)), CAST(0 AS DOUBLE),"
                    f" (acc, v) -> acc + v))"
                )
                repl = f"(1.0 - ({dot}) / ({na} * {nb}))"
        elif name in ("toStartOfFiveMinutes", "toStartOfTenMinutes",
                      "toStartOfFifteenMinutes", "timeSlot"):
            secs = {"toStartOfFiveMinutes": 300, "toStartOfTenMinutes": 600,
                    "toStartOfFifteenMinutes": 900, "timeSlot": 1800}[name]
            repl = (
                f"timestamp_seconds(CAST(floor(unix_timestamp({inner}) "
                f"/ {secs}) * {secs} AS BIGINT))"
            )
        elif name == "roundDown":
            x, arr = _split_top_commas(inner)
            repl = (
                f"coalesce(array_max(filter({arr}, e -> e <= ({x}))), "
                f"element_at({arr}, 1))"
            )
        elif name in ("roundAge", "roundDuration"):
            # ClickHouse's fixed breakpoint tables
            arr = (
                "array(0, 1, 18, 25, 35, 45, 55)"
                if name == "roundAge"
                else "array(0, 1, 10, 30, 60, 120, 180, 240, 300, 600, "
                "1200, 1800, 3600, 7200, 18000, 36000)"
            )
            repl = (
                f"coalesce(array_max(filter({arr}, e -> e <= ({inner}))), 0)"
            )
        elif name == "roundToExp2":
            # powers of two are exact doubles, so floor(log2) is safe
            # for the integral inputs this targets
            repl = (
                f"CASE WHEN ({inner}) < 1 THEN 0 ELSE "
                f"CAST(pow(2, floor(log2(CAST({inner} AS DOUBLE)))) AS BIGINT) END"
            )
        elif name == "IPv4NumToString":
            repl = (
                f"concat(CAST(({inner}) DIV 16777216 AS STRING), '.', "
                f"CAST((({inner}) DIV 65536) % 256 AS STRING), '.', "
                f"CAST((({inner}) DIV 256) % 256 AS STRING), '.', "
                f"CAST(({inner}) % 256 AS STRING))"
            )
        elif name == "IPv4StringToNum":
            repl = (
                f"(CAST(split_part({inner}, '.', 1) AS BIGINT) * 16777216 + "
                f"CAST(split_part({inner}, '.', 2) AS BIGINT) * 65536 + "
                f"CAST(split_part({inner}, '.', 3) AS BIGINT) * 256 + "
                f"CAST(split_part({inner}, '.', 4) AS BIGINT))"
            )
        elif name == "monthName":
            repl = f"date_format({inner}, 'MMMM')"
        elif name == "toISOWeek":
            repl = f"weekofyear({inner})"
        elif name == "toISOYear":
            repl = f"extract(YEAROFWEEK FROM {inner})"
        elif name == "tuple":
            # forced colN field names so tupleElement's positional
            # access resolves regardless of the operand shapes
            parts = _split_top_commas(inner)
            fields = ", ".join(
                f"'col{k + 1}', {p_}" for k, p_ in enumerate(parts)
            )
            repl = f"named_struct({fields})"
        elif name == "regexpExtract":
            parts = _split_top_commas(inner)
            if len(parts) == 2:
                parts.append("1")  # ClickHouse default group index
            repl = f"regexp_extract({parts[0]}, {parts[1]}, {parts[2]})"
        elif name == "countMatches":
            h, pat_ = _split_top_commas(inner)
            repl = f"size(regexp_extract_all({h}, {pat_}, 0))"
        elif name == "splitByRegexp":
            pat_, s_ = _split_top_commas(inner)
            repl = f"split({s_}, {pat_})"
        elif name == "tupleElement":
            t_, i_ = _split_top_commas(inner)
            if not re.fullmatch(r"\d+", i_.strip()):
                raise ValueError(
                    "tupleElement needs a literal index (struct fields "
                    "resolve at plan time)"
                )
            repl = f"({t_}).col{i_.strip()}"
        elif name == "cutQueryString":
            repl = f"substring_index({inner}, '?', 1)"
        elif name == "cutFragment":
            repl = f"substring_index({inner}, '#', 1)"
        elif name == "cutQueryStringAndFragment":
            repl = f"substring_index(substring_index({inner}, '#', 1), '?', 1)"
        elif name == "queryString":
            # ClickHouse returns '' (not NULL) when absent
            repl = f"coalesce(parse_url(substring_index({inner}, '#', 1), 'QUERY'), '')"
        elif name == "fragment":
            repl = f"coalesce(parse_url({inner}, 'REF'), '')"
        elif name == "decodeURLComponent":
            repl = f"url_decode({inner})"
        elif name == "domainWithoutWWW":
            repl = (
                f"regexp_replace(coalesce(parse_url({inner}, 'HOST'), ''), "
                f"'^www\\.', '')"
            )
        elif name == "protocol":
            repl = f"coalesce(parse_url({inner}, 'PROTOCOL'), '')"
        elif name in ("JSONExtractInt", "JSONExtractString", "JSONExtractFloat",
                      "JSONExtractBool", "JSONHas"):
            parts = _split_top_commas(inner)
            if len(parts) < 2:
                raise ValueError(f"{name} needs (json, key, ...)")
            path = "concat('$'" + "".join(
                f", '.', {k.strip()}" for k in parts[1:]
            ) + ")"
            got = f"get_json_object({parts[0]}, {path})"
            repl = {
                "JSONExtractInt": f"CAST({got} AS BIGINT)",
                "JSONExtractString": got,
                "JSONExtractFloat": f"CAST({got} AS DOUBLE)",
                "JSONExtractBool": f"CAST({got} AS BOOLEAN)",
                "JSONHas": f"({got} IS NOT NULL)",
            }[name]
        elif name == "JSONExtractKeys":
            repl = f"json_object_keys({inner})"
        elif name == "JSONLength":
            # arrays AND objects, like ClickHouse
            repl = (
                f"coalesce(json_array_length({inner}), "
                f"size(json_object_keys({inner})))"
            )
        elif name == "isValidJSON":
            repl = f"(get_json_object({inner}, '$') IS NOT NULL)"
        elif name == "age":
            # ClickHouse age() counts COMPLETE units elapsed (no
            # boundary truncation) — exactly Spark's timestampdiff
            parts = _split_top_commas(inner)
            if len(parts) != 3:
                raise ValueError("age needs (unit, start, end)")
            raw_unit = parts[0].strip()
            sent = re.fullmatch(r"\x01(\d+)\x01", raw_unit)
            if sent:
                raw_unit = literals[int(sent.group(1))]
            unit = raw_unit.strip().strip("'\"").lower()
            if unit not in _DATEDIFF_UNITS:
                raise ValueError(
                    f"age unit {parts[0]!r} unsupported "
                    f"(supported: {sorted(_DATEDIFF_UNITS)})"
                )
            repl = f"timestampdiff({unit.upper()}, {parts[1]}, {parts[2]})"
        elif name == "dateDiff":
            parts = _split_top_commas(inner)
            if len(parts) != 3:
                raise ValueError("dateDiff needs (unit, start, end)")
            raw_unit = parts[0].strip()
            sent = re.fullmatch(r"\x01(\d+)\x01", raw_unit)
            if sent:  # masked string literal — resolve it
                raw_unit = literals[int(sent.group(1))]
            unit = raw_unit.strip().strip("'\"").lower()
            if unit not in _DATEDIFF_UNITS:
                raise ValueError(
                    f"dateDiff unit {parts[0]!r} unsupported "
                    f"(supported: {sorted(_DATEDIFF_UNITS)})"
                )
            u = unit.upper()
            # ClickHouse counts crossed unit BOUNDARIES (dateDiff('day',
            # 23:00, next 01:00) = 1); truncating both ends first gives
            # Spark's timestampdiff the same semantics
            repl = (
                f"timestampdiff({u}, date_trunc('{u}', {parts[1]}), "
                f"date_trunc('{u}', {parts[2]}))"
            )
        elif name == "transform":
            # ClickHouse's VALUE-MAPPING transform(x, [from], [to][, def])
            # — not Spark's higher-order transform(arr, lambda), which
            # is what OUR arrayMap rewrite emits.  A lambda argument or
            # an unexpected arity means the call is (already) the Spark
            # HOF: re-emit under a sentinel so the rescan loop does not
            # see it again, restored on exit.
            parts = _split_top_commas(inner)
            if len(parts) in (3, 4) and not any("->" in p_ for p_ in parts):
                x, frm, to = parts[0], parts[1], parts[2]
                mapped = f"element_at(map_from_arrays({frm}, {to}), {x})"
                default = parts[3] if len(parts) == 4 else x
                repl = f"coalesce({mapped}, {default})"
            else:
                repl = f"__xform__({inner})"
        elif name in _OR_CASTS:
            kind, t = _OR_CASTS[name]
            tried = f"TRY_CAST({inner} AS {t})"
            if kind == "null":
                repl = tried
            elif t == "DATE":
                repl = f"coalesce({tried}, DATE '1970-01-01')"
            else:
                repl = f"coalesce({tried}, CAST(0 AS {t}))"
        elif name == "replaceOne":
            # first-occurrence replace: Spark's replace/regexp_replace
            # are replace-ALL, so splice at the first instr position
            h, s, r = _split_top_commas(inner)
            repl = (
                f"(CASE WHEN instr({h}, {s}) > 0 THEN "
                f"concat(substr({h}, 1, instr({h}, {s}) - 1), {r}, "
                f"substr({h}, instr({h}, {s}) + length({s}))) "
                f"ELSE {h} END)"
            )
        elif name == "replaceRegexpAll":
            # ClickHouse backreferences are \1..\9 (re2); Spark's
            # regexp_replace uses Java's $1..$9.  When the replacement
            # is a string literal, convert it and inline the converted
            # literal (masking already happened, so inline quotes are
            # safe); non-literal replacements pass through with Java
            # backref syntax (MIGRATION.md).
            h, p, r = _split_top_commas(inner)
            sent = re.fullmatch(r"\x01(\d+)\x01", r.strip())
            if sent:
                lit = literals[int(sent.group(1))]
                body = lit[1:-1] if len(lit) >= 2 else ""
                # both the raw (\1) and the SQL-escaped (\\1) spellings
                # convert to Java's $1 — consume every leading backslash
                body = re.sub(r"\\{1,2}(\d)", r"$\1", body)
                r = "'" + body + "'"
            repl = f"regexp_replace({h}, {p}, {r})"
        elif name == "extract":
            # ClickHouse's two-arg regex extract(haystack, pattern) —
            # first match, or first capture group when the pattern has
            # one (same literal-inspection as extractAll below).  The
            # SQL-standard EXTRACT(field FROM ts) has no top-level
            # comma and falls through untouched to Spark's extract.
            parts = _split_top_commas(inner)
            if len(parts) != 2:
                # sentinel, restored at return — re-emitting the bare
                # name would re-match this very pass and loop forever
                repl = f"__sql_extract__({inner})"
            else:
                h, p = parts
                idx = 0
                sent = re.fullmatch(r"\x01(\d+)\x01", p.strip())
                if sent:
                    body = literals[int(sent.group(1))][1:-1]
                    if re.search(r"(?<!\\)\((?!\?)", body):
                        idx = 1
                repl = f"regexp_extract({h}, {p}, {idx})"
        elif name == "extractAll":
            # ClickHouse: whole-match array, or first-group array when
            # the pattern has a capturing group.  Inspect the literal
            # pattern for an unescaped capturing '('; non-literal
            # patterns default to whole-match.
            h, p = _split_top_commas(inner)
            idx = 0
            sent = re.fullmatch(r"\x01(\d+)\x01", p.strip())
            if sent:
                body = literals[int(sent.group(1))][1:-1]
                if re.search(r"(?<!\\)\((?!\?)", body):
                    idx = 1
            repl = f"regexp_extract_all({h}, {p}, {idx})"
        elif name == "arraySlice":
            parts = _split_top_commas(inner)
            if len(parts) == 3:
                repl = f"slice({parts[0]}, {parts[1]}, {parts[2]})"
            elif len(parts) == 2:
                a, off = parts
                repl = f"slice({a}, {off}, size({a}))"
            else:
                raise ValueError("arraySlice needs (array, offset[, length])")
        elif name == "arrayEnumerate":
            # [1..size]; guard the empty array (sequence(1, 0) would
            # count DOWN with Spark's default negative step)
            repl = (
                f"(CASE WHEN size({inner}) = 0 THEN array() "
                f"ELSE sequence(1, size({inner})) END)"
            )
        elif name == "base64Decode":
            # Spark's unbase64 yields BINARY; ClickHouse returns String
            repl = f"CAST(unbase64({inner}) AS STRING)"
        elif name in ("isNaN", "isFinite", "isInfinite"):
            # ClickHouse returns UInt8 0/1, so comparisons like
            # isFinite(x) = 1 must keep working — cast the boolean
            x = inner
            if name == "isNaN":
                cond = f"isnan({x})"
            elif name == "isInfinite":
                cond = f"abs({x}) = CAST('Infinity' AS DOUBLE)"
            else:
                cond = (
                    f"(NOT isnan({x}) AND "
                    f"abs({x}) != CAST('Infinity' AS DOUBLE))"
                )
            repl = f"CAST({cond} AS INT)"
        elif name in ("dateAdd", "dateSub"):
            parts = _split_top_commas(inner)
            if len(parts) != 3:
                raise ValueError(f"{name} needs (unit, amount, datetime)")
            raw_unit = parts[0].strip()
            sent = re.fullmatch(r"\x01(\d+)\x01", raw_unit)
            if sent:
                raw_unit = literals[int(sent.group(1))]
            unit = raw_unit.strip().strip("'\"").lower()
            if unit not in _DATEDIFF_UNITS:
                raise ValueError(
                    f"{name} unit {parts[0]!r} unsupported "
                    f"(supported: {sorted(_DATEDIFF_UNITS)})"
                )
            amt = parts[1] if name == "dateAdd" else f"-({parts[1]})"
            repl = f"timestampadd({unit.upper()}, {amt}, {parts[2]})"
        elif name == "arrayReduce":
            # arrayReduce('agg', arr): named aggregate over an array —
            # the supported set maps to Spark array folds/builtins
            agg_raw, arr = _split_top_commas(inner)
            sent = re.fullmatch(r"\x01(\d+)\x01", agg_raw.strip())
            agg = (
                literals[int(sent.group(1))].strip("'\"").lower()
                if sent
                else agg_raw.strip().strip("'\"").lower()
            )
            # sum's accumulator takes the ELEMENT type's numeric width:
            # the seed `coalesce(try_element_at(arr,1), 0) * 0L * 1L`
            # is a statically-typed zero — BIGINT for any integral
            # element (ClickHouse sums Int* arrays to Int64; a DOUBLE
            # fold loses exactness above 2^53, round-6 advisory),
            # FLOAT/DOUBLE for fractional elements, and for DECIMAL the
            # two BIGINT multiplies saturate precision at the (38,s)
            # cap so `acc + x` keeps the accumulator type stable.
            # try_element_at: a plain element_at throws on empty arrays
            # under ANSI.  avg is Float64 in ClickHouse always, so it
            # keeps the DOUBLE fold.
            _seed = (
                f"coalesce(try_element_at({arr}, 1), 0)"
                f" * CAST(0 AS BIGINT) * CAST(1 AS BIGINT)"
            )
            reducers = {
                "max": f"array_max({arr})",
                "min": f"array_min({arr})",
                "sum": f"aggregate({arr}, {_seed}, (acc, x) -> acc + x)",
                "avg": (
                    f"(aggregate({arr}, CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
                    f" / size({arr}))"
                ),
                "count": f"size({arr})",
                "uniqexact": f"size(array_distinct({arr}))",
                "any": f"get({arr}, 0)",
            }
            if agg not in reducers:
                raise ValueError(
                    f"arrayReduce supports {sorted(reducers)}; got {agg!r} "
                    "(for other aggregates, explode the array and aggregate)"
                )
            repl = reducers[agg]
        elif name == "splitByWhitespace":
            # runs of whitespace, no empty substrings (ClickHouse drops
            # them; Spark's split keeps a leading empty on a
            # whitespace-prefixed string)
            repl = (
                f"filter(split({inner}, '\\\\s+'), x -> x != '')"
            )
        elif name == "arrayJaccardIndex":
            a, b = _split_top_commas(inner)
            # empty/empty yields NaN exactly like ClickHouse (a bare
            # division would be an ANSI divide-by-zero error)
            repl = (
                f"(CASE WHEN size(array_union({a}, {b})) = 0 "
                f"THEN CAST('NaN' AS DOUBLE) "
                f"ELSE CAST(size(array_intersect({a}, {b})) AS DOUBLE)"
                f" / size(array_union({a}, {b})) END)"
            )
        elif name == "ngrams":
            s, n = _split_top_commas(inner)
            # character n-grams; shorter-than-n strings yield an empty
            # array (a bare sequence(1, 0) would count DOWN)
            repl = (
                f"CASE WHEN length({s}) < ({n}) THEN array() "
                f"ELSE transform(sequence(1, length({s}) - ({n}) + 1), "
                f"__i -> substring({s}, __i, {n})) END"
            )
        elif name == "tokens":
            # the default tokenizer: maximal runs of alphanumeric
            # characters (underscore included), empties dropped
            repl = (
                f"filter(split({inner}, '[^\\\\p{{L}}\\\\p{{N}}_]+'), "
                f"__x -> __x != '')"
            )
        elif name == "multiSearchFirstIndex":
            s, arr = _split_top_commas(inner)
            # index (1-based) of the needle with the LEFTMOST match —
            # by match position, not list order; 0 if none match.  The
            # positions array is bound once via the 1-element transform
            # so the haystack scan per needle isn't repeated.
            repl = (
                f"transform(array(transform({arr}, __p -> locate(__p, {s}))), "
                f"__pos -> coalesce(array_position(__pos, "
                f"array_min(filter(__pos, __x -> __x > 0))), CAST(0 AS BIGINT)))[0]"
            )
        elif name == "mapFilter":
            lam, mp = _split_top_commas(inner)
            repl = f"map_filter({mp}, {lam})"  # lambda-first reorder
        elif name == "mapApply":
            lam, mp = _split_top_commas(inner)
            repl = _map_apply_expr(lam, mp)
        elif name == "mapUpdate":
            m1, m2 = _split_top_commas(inner)
            # m2's pairs override m1's on key collision
            repl = (
                f"map_concat(map_filter({m1}, (__k, __v) -> "
                f"NOT array_contains(map_keys({m2}), __k)), {m2})"
            )
        elif name == "simpleLinearRegression":
            x, y = _split_top_commas(inner)
            # ClickHouse fits y = k*x + b and returns the (k, b) tuple;
            # Spark's regr_* take the DEPENDENT variable first
            repl = (
                f"named_struct('col1', regr_slope({y}, {x}), "
                f"'col2', regr_intercept({y}, {x}))"
            )
        elif name == "entropy":
            # Shannon entropy (log2) of the value distribution.  The
            # 1-element transform binds the collected list once; the
            # per-distinct-value count is an O(n) filter — fine for the
            # grouped-aggregate shapes this appears in (same trade as
            # _topk_expr; for large flat groups use a two-level GROUP
            # BY instead).
            repl = (
                f"transform(array(collect_list({inner})), __l -> "
                f"aggregate(transform(array_distinct(__l), __v -> "
                f"CAST(size(filter(__l, __y -> __y = __v)) AS DOUBLE)), "
                f"CAST(0 AS DOUBLE), (__a, __c) -> "
                f"__a - (__c / size(__l)) * log2(__c / size(__l))))[0]"
            )
        elif name == "arrayEnumerateUniq":
            # occurrence number of each element among its predecessors
            # (1-based): count equal elements in the prefix ending here
            repl = (
                f"transform({inner}, (__x, __i) -> "
                f"size(filter(slice({inner}, 1, __i + 1), __y -> __y = __x)))"
            )
        elif name in ("sumArray", "minArray", "maxArray", "avgArray",
                      "countArray", "groupArrayArray"):
            # -Array combinator: the aggregate over ALL elements of all
            # of the group's arrays.  Per-row folds keep the work
            # map-side; no explode, no extra shuffle.  sumArray reuses
            # the integer-exact arrayReduce seed; avgArray is Float64
            # in ClickHouse so a DOUBLE fold is the faithful one.
            _seed = (
                f"coalesce(try_element_at({inner}, 1), 0)"
                f" * CAST(0 AS BIGINT) * CAST(1 AS BIGINT)"
            )
            _row = {
                "sumArray": f"aggregate({inner}, {_seed}, (acc, x) -> acc + x)",
                "minArray": f"array_min({inner})",
                "maxArray": f"array_max({inner})",
                "avgArray": (
                    f"aggregate({inner}, CAST(0 AS DOUBLE), "
                    f"(acc, x) -> acc + x)"
                ),
                "countArray": f"size({inner})",
                "groupArrayArray": inner,
            }[name]
            repl = {
                "sumArray": f"sum({_row})",
                "minArray": f"min({_row})",
                "maxArray": f"max({_row})",
                "avgArray": f"(sum({_row}) / sum(size({inner})))",
                "countArray": f"sum({_row})",
                "groupArrayArray": f"flatten(collect_list({_row}))",
            }[name]
        elif name in ("sumDistinct", "avgDistinct"):
            agg = name[: -len("Distinct")]
            repl = f"{agg}(DISTINCT {inner})"
        elif name in ("CAST", "accurateCast", "accurateCastOrNull"):
            # ClickHouse's comma form CAST(x, 'Int64') — the type is a
            # string literal resolved through the DDL type map.  The
            # SQL-standard CAST(x AS T) has no top-level comma (DECIMAL
            # (p, s) commas sit inside parens) and passes through via
            # the sentinel; so does a non-literal second operand (e.g.
            # a STRUCT<...> type whose <> commas look top-level).
            parts = _split_top_commas(inner)
            sent = (
                re.fullmatch(r"\x01(\d+)\x01", parts[1].strip())
                if len(parts) == 2
                else None
            )
            if not sent:
                repl = f"__sql_cast__({inner})"
            else:
                from substreams_sink_clickhouse_spark.sources.clickhouse_ddl import (
                    parse_clickhouse_type,
                )

                ch_t = literals[int(sent.group(1))][1:-1]
                spark_t = parse_clickhouse_type(ch_t).simpleString()
                op_kw = "TRY_CAST" if name == "accurateCastOrNull" else "CAST"
                repl = f"{op_kw}({parts[0]} AS {spark_t})"
        elif name.startswith("toInterval"):
            unit = name[len("toInterval"):]
            slot = {
                "Year": "({n}), 0, 0, 0, 0, 0, 0",
                "Quarter": "0, ({n}) * 3, 0, 0, 0, 0, 0",
                "Month": "0, ({n}), 0, 0, 0, 0, 0",
                "Week": "0, 0, ({n}), 0, 0, 0, 0",
                "Day": "0, 0, 0, ({n}), 0, 0, 0",
                "Hour": "0, 0, 0, 0, ({n}), 0, 0",
                "Minute": "0, 0, 0, 0, 0, ({n}), 0",
                "Second": "0, 0, 0, 0, 0, 0, ({n})",
            }[unit]
            repl = f"make_interval({slot.format(n=inner)})"
        elif name in ("toUnixTimestamp64Milli", "toUnixTimestamp64Micro"):
            # unix_millis/unix_micros require TIMESTAMP (with zone);
            # the parquet fixtures load as TIMESTAMP_NTZ, so cast first
            # (session zone is pinned UTC — same instant either way)
            fn = "unix_millis" if name.endswith("Milli") else "unix_micros"
            repl = f"{fn}(CAST({inner} AS TIMESTAMP))"
        elif name == "toDecimalString":
            x, nd = _split_top_commas(inner)
            nd = nd.strip()
            if not nd.isdigit():
                raise ValueError(
                    "toDecimalString needs a literal decimal count "
                    "(the format string is built at translation time)"
                )
            repl = f"format_string('%.{int(nd)}f', CAST({x} AS DOUBLE))"
        elif name == "greatCircleDistance":
            lon1, lat1, lon2, lat2 = _split_top_commas(inner)
            # haversine on the same 6371 km sphere as q84_geo_distance
            # (documented deviation: ClickHouse uses R=6372797.560856 m
            # — a fixed 0.03% scale difference)
            repl = (
                f"(2.0 * 6371000.0 * asin(sqrt("
                f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
                f"cos(radians({lat1})) * cos(radians({lat2})) * "
                f"pow(sin(radians(({lon2}) - ({lon1})) / 2), 2))))"
            )
        elif name == "ifNotFinite":
            x, y = _split_top_commas(inner)
            repl = (
                f"(CASE WHEN isnan({x}) OR abs({x}) = "
                f"CAST('Infinity' AS DOUBLE) THEN {y} ELSE {x} END)"
            )
        elif name == "bitTest":
            x, n = _split_top_commas(inner)
            repl = f"CAST((shiftright({x}, {n}) & 1) AS TINYINT)"
        elif name == "median":
            repl = f"percentile_approx({inner}, 0.5)"
        elif name == "medianExact":
            # same interpolation deviation as quantileExact (MIGRATION.md)
            repl = f"percentile({inner}, 0.5)"
        elif name == "arrayUniq":
            # n-ary form counts distinct TUPLES across parallel arrays
            # (a bare array_distinct(a, b) would not even parse)
            parts = _split_top_commas(inner)
            arg = inner if len(parts) == 1 else f"arrays_zip({inner})"
            repl = f"size(array_distinct({arg}))"
        elif name in ("arrayPartialSort", "arrayPartialReverseSort"):
            # ClickHouse sorts the first N positions and leaves the
            # rest in UNSPECIFIED order — a fully sorted array is a
            # legal realization (and the deterministic one), so the
            # translation is a plain sort; the N operand only matters
            # for ClickHouse's partial-sort cost model
            parts = _split_top_commas(inner)
            if len(parts) != 2:
                raise ValueError(f"{name} needs (limit, array)")
            desc = ", false" if name == "arrayPartialReverseSort" else ""
            repl = f"sort_array({parts[1]}{desc})"
        elif name == "countEqual":
            parts = _split_top_commas(inner)
            if len(parts) != 2:
                raise ValueError("countEqual needs (array, value)")
            repl = f"size(filter({parts[0]}, __ce -> __ce <=> ({parts[1]})))"
        elif name == "intDiv":
            parts = _split_top_commas(inner)
            if len(parts) != 2:
                raise ValueError("intDiv needs (a, b)")
            # ClickHouse truncates the QUOTIENT, not the operands:
            # intDiv(10, 2.5) = 4, never 10 div 2 = 5 (round-7
            # advisory).  Integral inputs keep the exact `div` path
            # (a DOUBLE round-trip would corrupt values > 2^53);
            # everything else divides as DOUBLE first and truncates
            # via CAST (toward zero, matching ClickHouse's float
            # intDiv).  typeof() resolves per input at runtime and
            # constant-folds for literals, so the CASE costs nothing
            # in the common all-integer plans.
            repl = _int_div_expr(parts[0], parts[1])
        elif name == "modulo":
            parts = _split_top_commas(inner)
            if len(parts) != 2:
                raise ValueError("modulo needs (a, b)")
            repl = f"(({parts[0]}) % ({parts[1]}))"
        elif name == "notEmpty":
            repl = f"(size({inner}) > 0)"
        elif name == "empty":
            repl = f"(size({inner}) = 0)"
        elif name == "multiIf":
            parts = _split_top_commas(inner)
            if len(parts) < 3 or len(parts) % 2 == 0:
                raise ValueError(
                    "multiIf needs cond1, val1, ..., else (odd argument count)"
                )
            whens = "".join(
                f" WHEN {parts[k]} THEN {parts[k + 1]}"
                for k in range(0, len(parts) - 1, 2)
            )
            repl = f"(CASE{whens} ELSE {parts[-1]} END)"
        elif name in EXT_WRAPS:
            repl = EXT_WRAPS[name](inner, _split_top_commas(inner), literals)
        else:  # numbers(N) — __tbl_range__ keeps the scalar range()
            # handler (array sequence) from re-rewriting the emitted
            # table function
            repl = f"(SELECT id AS number FROM __tbl_range__({inner}))"
        code = code[: m.start(1)] + repl + code[cp + 1 :]


_PARAM_AGGS_PAT = None


def _rewrite_param_aggs(code: str, literals: tuple = ()) -> str:
    """Rewrite ClickHouse's two-paren-group parameterized aggregates
    ``name(params)(args)`` (see :data:`_PARAM_AGGS`).  Longest names
    match first so ``quantilesExact`` never parses as ``quantiles``."""
    global _PARAM_AGGS_PAT
    if _PARAM_AGGS_PAT is None:  # compiled once per process (recursive calls)
        _PARAM_AGGS_PAT = re.compile(
            r"\b("
            + "|".join(
                sorted(list(_PARAM_AGGS) + list(EXT_PARAM_AGGS), key=len, reverse=True)
            )
            + r")\s*\("
        )
    pat = _PARAM_AGGS_PAT
    guard = 0
    while True:
        guard += 1
        if guard > 10_000:
            raise ValueError(
                "parameterized-aggregate rewrite did not converge - a "
                "handler re-emits its own (or another handled) name"
            )
        m = pat.search(code)
        if not m:
            return code
        name = m.group(1)
        p_open = code.index("(", m.end(1))
        p_close = _match_paren(code, p_open)
        # args group right after the params group — or ClickHouse's
        # legal single-group form (quantile(x) = median, topK(x) = 10)
        k = p_close + 1
        while k < len(code) and code[k].isspace():
            k += 1
        if k >= len(code) or code[k] != "(":
            single = _rewrite_param_aggs(code[p_open + 1 : p_close], literals)
            if name in EXT_PARAM_AGGS:
                repl = EXT_PARAM_AGGS[name](None, single, literals)
            elif name == "topK":
                repl = _topk_expr(single, "10")  # CH default k
            elif name == "topKWeighted":
                x, wgt = _split_top_commas(single)
                repl = _topk_weighted_expr(x, wgt, "10")  # CH default k
            elif name == "quantileExactWeighted":
                x, wgt = _split_top_commas(single)
                repl = f"percentile({x}, 0.5, {wgt})"
            elif name in ("quantile", "quantileExact", "quantileTDigest"):
                spark_name, _ = _PARAM_AGGS[name]
                repl = f"{spark_name}({single}, 0.5)"  # CH default level
            else:
                raise ValueError(
                    f"{name} needs an explicit level list: "
                    f"{name}(p1, p2, ...)(x)"
                )
            code = code[: m.start(1)] + repl + code[p_close + 1 :]
            continue
        a_close = _match_paren(code, k)
        params = _rewrite_param_aggs(code[p_open + 1 : p_close], literals)
        args = _rewrite_param_aggs(code[k + 1 : a_close], literals)
        if name in EXT_PARAM_AGGS:
            repl = EXT_PARAM_AGGS[name](params, args, literals)
        elif name == "topK":
            repl = _topk_expr(args, params)
        elif name == "topKWeighted":
            x, wgt = _split_top_commas(args)
            repl = _topk_weighted_expr(x, wgt, params)
        elif name == "quantileExactWeighted":
            x, wgt = _split_top_commas(args)
            repl = f"percentile({x}, {params}, {wgt})"
        else:
            spark_name, as_array = _PARAM_AGGS[name]
            p = f"array({params})" if as_array else params
            repl = f"{spark_name}({args}, {p})"
        code = code[: m.start(1)] + repl + code[a_close + 1 :]


#: Table-reference pattern in MASKED code: a plain dotted name or a
#: masked backquoted identifier (the ``\x01N\x01`` sentinel) — without
#: the sentinel alternative, ``FROM `events` FINAL`` would slip past
#: the FINAL guard and Spark would silently parse FINAL as an alias.
_TABLE_REF = r"(?:\x01\d+\x01|[\w.]+)"


def _blank_parens(code: str) -> str:
    """Copy of ``code`` with the CONTENT of every paren group replaced
    by spaces (parens themselves kept, length preserved) so regex
    searches see only depth-0 clause keywords at positions that map
    straight back into the original string."""
    out = list(code)
    depth = 0
    for i, ch in enumerate(code):
        if ch == "(":
            depth += 1
            if depth == 1:
                continue
        elif ch == ")":
            depth -= 1
            if depth == 0:
                continue
        if depth > 0:
            out[i] = " "
    return "".join(out)


def _map_paren_groups(code: str, fn) -> str:
    """Apply ``fn`` to the content of every top-level paren group
    (subqueries rewrite themselves before the enclosing level does)."""
    out: list[str] = []
    i = 0
    while i < len(code):
        if code[i] == "(":
            j = _match_paren(code, i)
            out.append("(" + fn(code[i + 1 : j]) + ")")
            i = j + 1
        else:
            k = code.find("(", i)
            if k == -1:
                k = len(code)
            out.append(code[i:k])
            i = k
    return "".join(out)


def _rewrite_limit_by(code: str) -> str:
    """``LIMIT [o,] n BY <exprs>`` / ``LIMIT n OFFSET o BY <exprs>``
    → row_number window ≤ n (both ClickHouse offset spellings; note
    the operand order differs between them).

    ClickHouse keeps the first ``n`` rows (after ``o`` skipped) per
    distinct value of the BY expressions, in the query's ORDER BY
    order, then applies any trailing plain LIMIT.  Rewritten as

        SELECT * EXCEPT (__lb_rn) FROM (
          SELECT *, row_number() OVER (
            PARTITION BY <exprs> ORDER BY <order-by | exprs>) AS __lb_rn
          FROM (<query minus ORDER BY / LIMIT BY>) __lb_src
        ) __lb WHERE __lb_rn <= n [ORDER BY ...] [LIMIT m]

    Documented limits (raise, never guess): the ORDER BY columns must
    be in the SELECT list (they feed the window over the wrapped
    subquery), and LIMIT BY directly on a depth-0 set operation is not
    supported — wrap the union in a subquery.  Without an ORDER BY the
    window orders by the BY expressions themselves (ClickHouse's pick
    is likewise unspecified there)."""
    code = _map_paren_groups(code, _rewrite_limit_by)
    while True:
        blank = _blank_parens(code)
        m = re.search(
            r"\bLIMIT\s+(\d+)\s*(?:(,|OFFSET)\s*(\d+)\s*)?BY\b",
            blank,
            re.IGNORECASE,
        )
        if not m:
            return code
        if re.search(r"\b(?:UNION|INTERSECT|EXCEPT)\b", blank[: m.start()], re.IGNORECASE):
            raise ValueError(
                "LIMIT n BY over a set operation is ambiguous - wrap the "
                "UNION/INTERSECT/EXCEPT in a subquery and apply LIMIT BY "
                "outside it"
            )
        # ClickHouse has two offset spellings with SWAPPED operand
        # order: ``LIMIT o, n BY`` (offset first) and
        # ``LIMIT n OFFSET o BY`` (count first).
        if m.group(2) is None:
            offset, n = 0, int(m.group(1))
        elif m.group(2) == ",":
            offset, n = int(m.group(1)), int(m.group(3))
        else:
            offset, n = int(m.group(3)), int(m.group(1))
        tail_m = re.search(r"\bLIMIT\b", blank[m.end() :], re.IGNORECASE)
        cols_end = m.end() + tail_m.start() if tail_m else len(code)
        cols = code[m.end() : cols_end].strip().rstrip(",")
        if not cols:
            raise ValueError("LIMIT n BY needs at least one expression")
        ob = None
        for ob_m in re.finditer(r"\bORDER\s+BY\b", blank, re.IGNORECASE):
            if ob_m.end() <= m.start():
                ob = ob_m
        if ob is not None:
            order_text = code[ob.end() : m.start()].strip().rstrip(",")
            base = code[: ob.start()].strip()
        else:
            order_text = None
            base = code[: m.start()].strip()
        window_order = order_text if order_text else cols
        cond = (
            f"__lb_rn > {offset} AND __lb_rn <= {offset + n}"
            if offset
            else f"__lb_rn <= {n}"
        )
        rewritten = (
            f"SELECT * EXCEPT (__lb_rn) FROM ("
            f"SELECT *, row_number() OVER (PARTITION BY {cols} "
            f"ORDER BY {window_order}) AS __lb_rn FROM ({base}) __lb_src"
            f") __lb WHERE {cond}"
        )
        if order_text:
            rewritten += f" ORDER BY {order_text}"
        tail = code[cols_end:]
        code = rewritten + (" " + tail.lstrip() if tail.strip() else "")


def _rewrite_with_totals(code: str) -> str:
    """``GROUP BY <keys> WITH TOTALS`` → ``GROUP BY GROUPING SETS
    ((<keys>), ())`` — the per-group rows plus exactly one grand-total
    row, with the group keys NULL on the totals row (ClickHouse's TSV
    rendering leaves them empty/default; NULL is the relational
    equivalent — ``coalesce`` the keys to tag it, the q108 shape).

    ``WITH TOTALS ... HAVING cond`` translates with ClickHouse's
    DEFAULT ``totals_mode = 'before_having'``: the totals row
    aggregates ALL rows — including groups HAVING later eliminates —
    so the condition becomes ``HAVING grouping(<first key>) = 1 OR
    (cond)`` (the totals row has every key aggregated; group rows
    none).  The non-default totals_mode variants
    (after_having_exclusive/inclusive/auto) are not emulated —
    express those explicitly as GROUPING SETS (documented deviation,
    MIGRATION.md)."""
    code = _map_paren_groups(code, _rewrite_with_totals)
    while True:
        blank = _blank_parens(code)
        # ``WITH TOTALS`` is only the clause when a GROUP BY precedes
        # it at this depth — a CTE or identifier literally named
        # ``totals`` (``WITH totals AS (...) SELECT ... FROM totals``)
        # must pass through untouched, not raise.
        m = gb = None
        for cand in re.finditer(r"\bWITH\s+TOTALS\b", blank, re.IGNORECASE):
            last_gb = None
            for gb_m in re.finditer(r"\bGROUP\s+BY\b", blank, re.IGNORECASE):
                if gb_m.end() <= cand.start():
                    last_gb = gb_m
            if last_gb is not None:
                m, gb = cand, last_gb
                break
        if m is None:
            return code
        keys = code[gb.end() : m.start()].strip().rstrip(",")
        if not keys:
            raise ValueError("GROUP BY ... WITH TOTALS needs group keys")
        tail = code[m.end() :]
        having_m = re.search(r"\bHAVING\b", _blank_parens(tail), re.IGNORECASE)
        if having_m is not None:
            # before_having: keep the totals row unconditionally
            bound_m = re.search(
                r"\b(?:ORDER\s+BY|LIMIT|SETTINGS|WINDOW|UNION|INTERSECT|EXCEPT)\b",
                _blank_parens(tail)[having_m.end() :],
                re.IGNORECASE,
            )
            cond_end = (
                having_m.end() + bound_m.start() if bound_m else len(tail)
            )
            cond = tail[having_m.end() : cond_end].strip()
            if not cond:
                raise ValueError("HAVING needs a condition")
            first_key = _split_top_commas(keys)[0].strip()
            tail = (
                tail[: having_m.start()]
                + f"HAVING grouping({first_key}) = 1 OR ({cond})"
                + tail[cond_end:]
            )
        code = (
            code[: gb.start()] + f"GROUP BY GROUPING SETS (({keys}), ())" + tail
        )


def _rewrite_clauses(code: str) -> str:
    """Clause-level ClickHouse-isms:

    * ``[LEFT] ARRAY JOIN <expr> AS <alias>`` → ``LATERAL VIEW
      [OUTER] explode(<expr>) _aj_<alias> AS <alias>``
    * ``GLOBAL JOIN`` / ``GLOBAL IN`` — a distributed-execution hint
      with no Spark meaning; the keyword is dropped.
    * ``PREWHERE`` → ``WHERE`` when the query level has no WHERE of
      its own (Catalyst pushes predicates regardless, so PREWHERE is
      purely syntactic); a query using BOTH clauses must merge them —
      we raise rather than guess.
    * ``FROM t FINAL`` — needs the engine's version-column metadata
      (``Engine.table(name, final=True)``); raise with that pointer
      instead of silently dropping the keyword.
    """
    # FINAL is only meaningful immediately after a table reference
    # (FROM t FINAL / JOIN t [AS a] FINAL) — anchoring there keeps a
    # column or alias literally named ``final`` legal.  ``AS`` is in
    # the lookahead so the alias word can never be AS itself (else
    # backtracking would let ``FROM t AS final`` trip the guard).
    _kw = (
        r"(?!WHERE\b|PREWHERE\b|GROUP\b|ORDER\b|HAVING\b|LIMIT\b|ON\b|"
        r"USING\b|UNION\b|SETTINGS\b|INNER\b|LEFT\b|RIGHT\b|FULL\b|"
        r"CROSS\b|JOIN\b|SAMPLE\b|SELECT\b|AS\b)"
    )
    if re.search(
        r"\b(?:FROM|JOIN)\s+" + _TABLE_REF + r"(?:\s+(?:AS\s+)?" + _kw + r"\w+)?\s+FINAL\b",
        code,
        flags=re.IGNORECASE,
    ):
        raise ValueError(
            "FROM ... FINAL needs table metadata: read the table with "
            "Engine.table(name, final=True) instead"
        )
    # likewise SAMPLE k: table-reference position only, so an alias or
    # function named ``sample`` followed by a number literal elsewhere
    # (e.g. ``sample + 1``) is not a false positive.
    if re.search(
        r"\b(?:FROM|JOIN)\s+" + _TABLE_REF + r"(?:\s+FINAL)?\s+SAMPLE\s+[\d.]+",
        code,
        flags=re.IGNORECASE,
    ):
        raise ValueError(
            "SAMPLE k is keyed deterministic sampling in ClickHouse; use "
            "a hash predicate (the q33_sample shape) or TABLESAMPLE "
            "explicitly if approximate sampling is acceptable"
        )
    if re.search(r"\bWITH\s+FILL\b", code, flags=re.IGNORECASE):
        raise ValueError(
            "ORDER BY ... WITH FILL generates spine rows with per-column "
            "DEFAULT values - a type-aware structural rewrite, not a "
            "lexical one.  Run the query through Engine.sql(...,"
            " dialect='clickhouse') which implements it (functions/"
            "fill.py), or use the explicit gap-fill operators (the "
            "q47_gapfill / q118_interpolate shapes)"
        )
    # ClickHouse join STRICTNESS: ASOF JOIN is translated for real by
    # _rewrite_asof_join (bounded union+window / fallback top-1) and
    # [LEFT|INNER|RIGHT|FULL] ANY JOIN by _rewrite_any_join (the
    # many-match side(s) deduped per key BEFORE the join, pick pinned
    # to the lexicographic min); USING desugars to ON for both
    # (_desugar_strict_using).  All of those consume the keyword
    # before this guard.  What remains is the unsupported surface —
    # non-equi ON, self-aliased sides — which must raise: dropping
    # the strictness keyword would silently change row multiplicity.
    if re.search(
        r"\b(?:ANY\s+(?:LEFT|RIGHT|INNER|FULL)?\s*JOIN|"
        r"(?:LEFT|RIGHT|INNER|FULL)\s+ANY\s+JOIN)\b",
        code,
        flags=re.IGNORECASE,
    ):
        raise ValueError(
            "this ANY JOIN form is not translatable (supported: "
            "[LEFT|INNER|RIGHT|FULL] ANY JOIN with plain-column "
            "equality ON or USING; ch_any_join) - ANY keeps one "
            "matching row per key, so for other forms reduce the "
            "many-match side yourself (min_by/max_by per key before "
            "a plain join)"
        )
    if re.search(r"\bINTO\s+OUTFILE\b", code, flags=re.IGNORECASE):
        raise ValueError(
            "INTO OUTFILE is client-side output in ClickHouse; write the "
            "result with DataFrame.write or the CLI's sql --format"
        )
    if re.search(r"\bPREWHERE\b", code, flags=re.IGNORECASE):
        if re.search(r"\bWHERE\b", code, flags=re.IGNORECASE):
            raise ValueError(
                "query uses both PREWHERE and WHERE - merge PREWHERE "
                "into the WHERE clause (Spark pushes predicates to the "
                "scan either way)"
            )
        code = re.sub(r"\bPREWHERE\b", "WHERE", code, flags=re.IGNORECASE)
    code = re.sub(r"\bGLOBAL\s+(?=JOIN\b|IN\b|ANY\b|ALL\b)", "", code, flags=re.IGNORECASE)
    code = re.sub(
        r"\bLEFT\s+ARRAY\s+JOIN\s+(\w+(?:\.\w+)?)\s+AS\s+(\w+)",
        r"LATERAL VIEW OUTER explode(\1) _aj_\2 AS \2",
        code,
        flags=re.IGNORECASE,
    )
    code = re.sub(
        r"\bARRAY\s+JOIN\s+(\w+(?:\.\w+)?)\s+AS\s+(\w+)",
        r"LATERAL VIEW explode(\1) _aj_\2 AS \2",
        code,
        flags=re.IGNORECASE,
    )
    return code


def _guard_preceding_join(code: str, pos: int, kind: str) -> None:
    """ASOF/ANY rewrites splice ``FROM <left table>`` back into the
    text, so the strict join must be the only join in its FROM scope:
    a *preceding* join would make the lexical left-table token the
    trailing identifier of that join's ON clause (e.g. the ``k`` of
    ``ON t0.k = k.k``) and the splice would corrupt it mid-expression.
    Walk backwards from the match at paren depth 0; a ``JOIN`` before
    the owning ``FROM`` means a preceding join — raise the curated
    guidance instead of emitting unparseable SQL."""
    depth = 0
    for tm in reversed(
        list(re.finditer(r"[()]|\b(?:FROM|JOIN)\b", code[:pos], re.IGNORECASE))
    ):
        tok = tm.group(0)
        if tok == ")":
            depth += 1
        elif tok == "(":
            if depth == 0:
                return  # subquery scope opened bare; nothing to guard
            depth -= 1
        elif depth == 0:
            if tok.upper() == "JOIN":
                raise ValueError(
                    f"{kind} JOIN must be the only join in its FROM "
                    "clause here - put preceding joins in a WITH "
                    "subquery"
                )
            return  # hit the owning FROM first: clean scope


#: ``X [alias] <strictness> JOIN Y [alias] USING (c1, …)`` for the
#: ASOF / ANY strictnesses.  Group layout mirrors the ON patterns
#: below plus the column list; the desugar rewrites USING → ON so the
#: main translations see one canonical form.
#:
#: Reserved words that can never be the left-table token or a bare
#: alias in ANY of the four strictness patterns: without this guard,
#: an UNALIASED left side after a select list ending in an identifier
#: ("… AS bt FROM t ANY JOIN …") binds ``FROM`` as the table and
#: ``t`` as its alias, splicing unparseable "FROM AS t" text (caught
#: by test_join_strictness_fuzz).
_NOT_KW = r"(?!(?:FROM|WHERE|SELECT|AS|ON|AND|OR|BY|JOIN|GROUP|ORDER|HAVING|UNION)\b)"

_ASOF_USING_PAT = re.compile(
    r"\b" + _NOT_KW + r"(\w+)"
    r"(?:\s+(?:AS\s+)?(?!ASOF\b|JOIN\b|LEFT\b|ON\b|USING\b)"
    + _NOT_KW + r"(\w+))?"
    r"\s+ASOF\s+(LEFT\s+)?JOIN\s+"
    r"(\w+)(?:\s+(?:AS\s+)?(?!ON\b|USING\b)(\w+))?\s+USING\s*\(([^()]*)\)",
    re.IGNORECASE,
)

_ANY_USING_PAT = re.compile(
    r"\b" + _NOT_KW + r"(\w+)(?:\s+(?:AS\s+)?"
    r"(?!ANY\b|JOIN\b|LEFT\b|INNER\b|RIGHT\b|FULL\b|CROSS\b|ON\b|USING\b)"
    + _NOT_KW + r"(\w+))?"
    r"\s+(?:ANY\s+(?:(LEFT|INNER|RIGHT|FULL)\s+)?JOIN"
    r"|(LEFT|INNER|RIGHT|FULL)\s+ANY\s+JOIN)\s+"
    r"(\w+)(?:\s+(?:AS\s+)?(?!ON\b|USING\b)(\w+))?\s+USING\s*\(([^()]*)\)",
    re.IGNORECASE,
)


def _desugar_strict_using(code: str) -> str:
    """ClickHouse ``USING (…)`` on ASOF/ANY joins → the equivalent
    ``ON`` list, so the strictness translations below handle one
    canonical form (docs join#asof-join-usage: with USING, the LAST
    column is the closest-match column, semantics ``l.ts >= r.ts``;
    every other column is a plain equality).

    Column-reference scope after the desugar: the translations carry
    each side as a struct column named by its alias, so references to
    the join columns must stay *qualified* (``a.k`` / ``b.k``) —
    ClickHouse's USING-coalesced bare ``k`` does not resolve, and a
    bare ``SELECT *`` flattens to ``a.*, b.*`` (both copies of the
    join columns) rather than ClickHouse's coalesced single copy.
    Noisy AnalysisException either way, never a silent wrong answer."""
    def _names(cols_sql: str) -> list[str]:
        names = [c.strip() for c in cols_sql.split(",") if c.strip()]
        if not all(re.fullmatch(r"\w+", c) for c in names):
            raise ValueError(
                "USING (...) on an ASOF/ANY join must list plain "
                "column names"
            )
        return names

    while True:
        m = _ASOF_USING_PAT.search(code)
        if m is None:
            break
        a_alias = m.group(2) or m.group(1)
        b_alias = m.group(5) or m.group(4)
        names = _names(m.group(6))
        if len(names) < 2:
            raise ValueError(
                "ASOF JOIN USING needs at least two columns - the "
                "last is the closest-match (inequality) column"
            )
        conds = [f"{a_alias}.{c} = {b_alias}.{c}" for c in names[:-1]]
        conds.append(f"{a_alias}.{names[-1]} >= {b_alias}.{names[-1]}")
        um = re.search(r"\bUSING\b", code[m.start(): m.end()], re.IGNORECASE)
        using_at = m.start() + um.start()
        code = (
            code[:using_at] + "ON " + " AND ".join(conds) + code[m.end():]
        )
    while True:
        m = _ANY_USING_PAT.search(code)
        if m is None:
            break
        a_alias = m.group(2) or m.group(1)
        b_alias = m.group(6) or m.group(5)
        names = _names(m.group(7))
        if not names:
            raise ValueError("ANY JOIN USING needs at least one column")
        conds = [f"{a_alias}.{c} = {b_alias}.{c}" for c in names]
        um = re.search(r"\bUSING\b", code[m.start(): m.end()], re.IGNORECASE)
        using_at = m.start() + um.start()
        code = (
            code[:using_at] + "ON " + " AND ".join(conds) + code[m.end():]
        )
    return code


_ASOF_PAT = re.compile(
    r"\b" + _NOT_KW + r"(\w+)"
    r"(?:\s+(?:AS\s+)?(?!ASOF\b|JOIN\b|LEFT\b|ON\b)" + _NOT_KW + r"(\w+))?"
    r"\s+ASOF\s+(LEFT\s+)?JOIN\s+"
    r"(\w+)(?:\s+(?:AS\s+)?(?!ON\b|USING\b)(\w+))?\s+ON\s+",
    re.IGNORECASE,
)

#: depth-0 keywords that end an ASOF join's ON condition list
_ASOF_TERM = re.compile(
    r"\b(WHERE|GROUP|ORDER|LIMIT|HAVING|UNION|EXCEPT|INTERSECT|"
    r"SETTINGS|WINDOW|FORMAT|JOIN|LEFT|RIGHT|INNER|CROSS|FULL|ASOF)\b",
    re.IGNORECASE,
)

#: depth-0 keywords that end a WHERE predicate (a WHERE can never be
#: followed by a join keyword, so the list is _ASOF_TERM minus those)
_ASOF_PRED_TERM = re.compile(
    r"\b(GROUP|ORDER|LIMIT|HAVING|UNION|EXCEPT|INTERSECT|"
    r"SETTINGS|WINDOW|FORMAT)\b",
    re.IGNORECASE,
)


def _flatten_owner_star(
    code: str, pos: int, a_alias: str, b_alias: str
) -> str | None:
    """Rewrite a bare ``*`` in the SELECT list that owns the ASOF join
    at ``pos`` to ``a.*, b.*`` (Spark expands a struct column's fields
    for ``col.*``), so ``SELECT *`` yields ClickHouse's flattened
    left-then-right columns instead of the rewrite's two struct
    columns.  Returns None when there is nothing to flatten."""
    # owning SELECT: scan backwards for a SELECT at the same paren
    # depth; hitting an unmatched '(' means the join's subquery scope
    # started without one (no owning SELECT — leave the query alone)
    sel = None
    depth = 0
    for tm in reversed(
        list(re.finditer(r"[()]|\bSELECT\b", code[:pos], re.IGNORECASE))
    ):
        tok = tm.group(0)
        if tok == ")":
            depth += 1
        elif tok == "(":
            if depth == 0:
                break
            depth -= 1
        elif depth == 0:
            sel = tm.end()
            break
    if sel is None:
        return None
    seg = code[sel:pos]
    fm = re.search(r"\bFROM\b", _blank_parens(seg), re.IGNORECASE)
    if fm is None:
        return None
    blanked = _blank_parens(seg[: fm.start()])
    start = 0
    bounds = [c.start() for c in re.finditer(r",", blanked)] + [len(blanked)]
    for end in bounds:
        item = blanked[start:end]
        im = re.fullmatch(
            r"\s*(?:(?:DISTINCT|ALL)\s+)?(\*)\s*", item, re.IGNORECASE
        )
        if im:
            at = sel + start + im.start(1)
            return (
                code[:at] + f"{a_alias}.*, {b_alias}.*" + code[at + 1 :]
            )
        start = end + 1
    return None


def _rewrite_asof_join(code: str) -> str:
    """ClickHouse ``[LEFT] ASOF JOIN`` → Spark SQL, two shapes (docs:
    for each left row, pick the right row with the closest value
    satisfying the one inequality in ON, within equal join keys).

    **Bounded shape** (the common case — every ON condition is a plain
    qualified column: ``a.k = b.k … AND a.ts >= b.ts``): tag both
    sides, UNION ALL, ONE running ``last_value(…, true)`` window per
    key ordered by (ts, side), keep tagged left rows — the shape of
    the engine's native as-of operator (operators/relational.py:
    _q31_asof).  One exchange per side into the window's hash
    partitioning, O(1) state per row, NO join operator in the plan:
    a hot key (one instrument holding millions of right rows) streams
    instead of fanning out.  Tie (equal ts) resolution follows the
    operator: inclusive ops see same-ts right rows, strict ops do
    not; among right rows that tie on (key, ts) the pick is PINNED to
    the lexicographically smallest right row (the struct column joins
    the window ORDER BY) — ClickHouse's pick there is arbitrary, this
    translation's is reproducible, matching the ANY translation's
    determinism contract (and requiring orderable right-row types,
    the same constraint as ANY's min(struct)).  NULL join keys /
    NULL asof columns never match (equi-join
    semantics), enforced by NULL-ing the carried struct on both
    sides.  The rewritten text names its derived tables ``__asof_u/
    __asof_w/__asof_b`` — ``Engine.sql("EXPLAIN SYNTAX …")`` shows
    which shape a query took.

    **Fallback shape** (general expressions in ON): equi-join + per-
    left-row top-1 window.  Both sides become single-STRUCT-column
    derived tables named by their aliases (qualified references keep
    working unchanged), left rows are identified by
    ``monotonically_increasing_id()`` (duplicate left rows each keep
    their own match, exactly ClickHouse's semantics), right rows rank
    by the inequality's right-side operand, rank 1 wins.  Catalyst
    plans the rank-1 filter as ``WindowGroupLimit`` — a streaming
    top-1, never a full sort — but the join output before it is
    O(|L_k|·|R_k|) per key (ClickHouse bounds the same blow-up by
    materializing per-key sorted arrays in memory); the fallback's
    rewritten text carries ``__asof_rn``/``__asof_rid``.

    Lexical scope (raise otherwise): both sides plain identifiers
    (tables/CTEs — pre-wrap subqueries in a WITH) and the ASOF join
    is the last join in its FROM.  A bare ``SELECT *`` over the join
    is flattened to ``a.*, b.*`` (ClickHouse's column order);
    ``a.*``/``b.*`` and qualified columns work as-is via struct-field
    expansion."""
    while True:
        m = _ASOF_PAT.search(code)
        if m is None:
            break
        a_tbl, a_alias, left_kw, b_tbl, b_alias = (
            m.group(1),
            m.group(2) or m.group(1),
            m.group(3) or "",
            m.group(4),
            m.group(5) or m.group(4),
        )
        _guard_preceding_join(code, m.start(), "ASOF")
        # ON-condition extent: scan the paren-blanked tail for the
        # first depth-0 clause keyword, an UNMATCHED ')' (the join
        # sits inside a subquery/CTE body — a ')' surviving
        # _blank_parens closes a scope opened before the tail, so the
        # conditions end there), or end of string
        tail = code[m.end() :]
        blanked = _blank_parens(tail)
        tm = _ASOF_TERM.search(blanked)
        end = tm.start() if tm else len(tail)
        par = blanked.find(")")
        if par != -1 and par < end:
            end = par
            tm = None
        conds_sql = tail[:end]
        suffix = tail[end:]
        if tm and tm.group(1).upper() in (
            "JOIN", "LEFT", "RIGHT", "INNER", "CROSS", "FULL", "ASOF",
        ):
            raise ValueError(
                "ASOF JOIN must be the last join in its FROM clause "
                "here - put preceding joins in a WITH subquery"
            )
        # a bare SELECT * over the join flattens to a.*, b.* FIRST
        # (the replacement shifts positions, so re-search from scratch;
        # the star is gone after one pass, so the loop converges)
        flat = _flatten_owner_star(code, m.start(), a_alias, b_alias)
        if flat is not None:
            code = flat
            continue
        # split depth-0 ANDs; exactly one inequality drives the pick
        parts: list[str] = []
        start = 0
        for am in re.finditer(r"\bAND\b", _blank_parens(conds_sql),
                              flags=re.IGNORECASE):
            parts.append(conds_sql[start : am.start()])
            start = am.end()
        parts.append(conds_sql[start:])
        ineq_idx = [
            i for i, p in enumerate(parts)
            if re.search(r"(?<![<>!=])(>=|<=|<(?!=)|>(?!=))(?!=)",
                         _blank_parens(p))
        ]
        if len(ineq_idx) != 1:
            raise ValueError(
                f"ASOF JOIN needs exactly ONE inequality in ON "
                f"(found {len(ineq_idx)}): the closest-match condition"
            )
        ineq = parts[ineq_idx[0]]
        om = re.search(r"(>=|<=|<|>)", _blank_parens(ineq))
        lhs = ineq[: om.start()].strip()
        op = om.group(1)
        rhs = ineq[om.end() :].strip()
        b_ref = re.compile(rf"\b{re.escape(b_alias)}\s*\.")
        if b_ref.search(rhs) and not b_ref.search(lhs):
            a_expr, b_expr, b_low = lhs, rhs, op in (">=", ">")
        elif b_ref.search(lhs) and not b_ref.search(rhs):
            a_expr, b_expr, b_low = rhs, lhs, op in ("<=", "<")
        else:
            raise ValueError(
                "ASOF JOIN inequality must compare a left-side to a "
                f"right-side ({b_alias}.) expression"
            )

        # ---- bounded path: every ON condition is a plain qualified
        # column -> union + one running last_value window (no join)
        def _plain(expr: str, alias: str) -> str | None:
            pm = re.fullmatch(
                rf"\s*{re.escape(alias)}\s*\.\s*(\w+)\s*", expr
            )
            return pm.group(1) if pm else None

        l_keys: list[str] = []
        r_keys: list[str] = []
        bounded = a_alias != b_alias
        for i, p in enumerate(parts):
            if i == ineq_idx[0]:
                continue
            em = re.fullmatch(
                r"\s*(\w+)\s*\.\s*(\w+)\s*=\s*(\w+)\s*\.\s*(\w+)\s*", p
            )
            if em and {em.group(1), em.group(3)} == {a_alias, b_alias}:
                if em.group(1) == a_alias:
                    l_keys.append(em.group(2))
                    r_keys.append(em.group(4))
                else:
                    l_keys.append(em.group(4))
                    r_keys.append(em.group(2))
            else:
                bounded = False
        l_ts = _plain(a_expr, a_alias)
        r_ts = _plain(b_expr, b_alias)
        if bounded and l_keys and l_ts is not None and r_ts is not None:
            # b is the lower bound (closest = MAX b.ts <= bound) ->
            # walk time forward and carry the last right row; upper
            # bound -> walk backward.  Tie order: inclusive ops see
            # same-ts right rows (right sorts first: side 0 < 1),
            # strict ops don't (left first: side DESC).
            ts_dir = "ASC" if b_low else "DESC"
            side_dir = "ASC" if op in (">=", "<=") else "DESC"
            part_cols = ", ".join(
                f"__asof_k{i}" for i in range(len(l_keys))
            )
            lsel = ", ".join(
                f"{c} AS __asof_k{i}" for i, c in enumerate(l_keys)
            )
            rsel = ", ".join(
                f"{c} AS __asof_k{i}" for i, c in enumerate(r_keys)
            )
            lnull = " OR ".join(
                f"{a_alias}.{c} IS NULL" for c in [*l_keys, l_ts]
            )
            rnull = " OR ".join(
                f"{c} IS NULL" for c in [*r_keys, r_ts]
            )
            match_f = "" if left_kw.strip() else (
                f" AND {b_alias} IS NOT NULL"
            )
            rewritten = (
                f"(SELECT {a_alias}, {b_alias} FROM "
                f"(SELECT {a_alias}, IF({lnull}, NULL, "
                f"last_value({b_alias}, true) OVER ("
                f"PARTITION BY {part_cols} "
                f"ORDER BY __asof_ts {ts_dir}, __asof_side {side_dir}, "
                f"{b_alias} DESC "
                f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) "
                f"AS {b_alias}, __asof_side FROM "
                f"(SELECT struct(*) AS {a_alias}, NULL AS {b_alias}, "
                f"{lsel}, {l_ts} AS __asof_ts, 1 AS __asof_side "
                f"FROM {a_tbl} UNION ALL "
                f"SELECT NULL AS {a_alias}, "
                f"IF({rnull}, NULL, struct(*)) AS {b_alias}, "
                f"{rsel}, {r_ts} AS __asof_ts, 0 AS __asof_side "
                f"FROM {b_tbl}) AS __asof_u) AS __asof_w "
                f"WHERE __asof_side = 1{match_f}) AS __asof_b "
            )
            code = code[: m.start()] + rewritten + suffix
            continue

        # ---- fallback: general expressions in ON -> equi-join +
        # per-left-row top-1 (fan-out hazard documented above)
        direction = "DESC" if b_low else "ASC"
        rewritten = (
            f"(SELECT {a_alias}, {b_alias}, row_number() OVER ("
            f"PARTITION BY __asof_rid ORDER BY {b_expr} {direction}, "
            f"{b_alias}) "
            f"AS __asof_rn "
            f"FROM (SELECT struct(*) AS {a_alias}, "
            f"monotonically_increasing_id() AS __asof_rid "
            f"FROM {a_tbl}) AS __asof_l "
            f"{left_kw.strip() + ' ' if left_kw.strip() else ''}JOIN "
            f"(SELECT struct(*) AS {b_alias} FROM {b_tbl}) AS __asof_r "
            f"ON {conds_sql.strip()}) "
        )
        wm = re.match(r"\s*WHERE\b", suffix, flags=re.IGNORECASE)
        if wm:
            # parenthesize the original predicate up to its depth-0
            # clause terminator: a top-level OR must not let non-top-1
            # fan-out rows leak through (AND binds tighter than OR)
            rest = suffix[wm.end() :]
            rb = _blank_parens(rest)
            pt = _ASOF_PRED_TERM.search(rb)
            pend = pt.start() if pt else len(rest)
            rpar = rb.find(")")  # subquery boundary ends the predicate
            if rpar != -1 and rpar < pend:
                pend = rpar
            suffix = (
                f" WHERE __asof_rn = 1 AND ({rest[:pend].strip()}) "
                + rest[pend:]
            )
        else:
            suffix = " WHERE __asof_rn = 1" + (
                " " + suffix if suffix.strip() else ""
            )
        code = code[: m.start()] + rewritten + suffix
    if re.search(r"\bASOF\b", code, flags=re.IGNORECASE):
        raise ValueError(
            "unsupported ASOF JOIN form (both sides must be plain "
            "table/CTE identifiers with an ON clause or a "
            "plain-column USING list)"
        )
    return code


_ANY_PAT = re.compile(
    r"\b" + _NOT_KW + r"(\w+)(?:\s+(?:AS\s+)?"
    r"(?!ANY\b|JOIN\b|LEFT\b|INNER\b|RIGHT\b|FULL\b|CROSS\b|ON\b)"
    + _NOT_KW + r"(\w+))?"
    r"\s+(?:ANY\s+(?:(LEFT|INNER|RIGHT|FULL)\s+)?JOIN"
    r"|(LEFT|INNER|RIGHT|FULL)\s+ANY\s+JOIN)\s+"
    r"(\w+)(?:\s+(?:AS\s+)?(?!ON\b|USING\b)(\w+))?\s+ON\s+",
    re.IGNORECASE,
)


def _rewrite_any_join(code: str) -> str:
    """ClickHouse ``[LEFT|INNER|RIGHT|FULL] ANY JOIN`` → dedupe the
    many-match side(s) + plain equi join (docs: ANY keeps at most one
    matching right row per left row; modern semantics,
    join#any-strictness).

    The many-match side collapses to ONE row per join key BEFORE the
    join — ``min(struct(*))`` per key — so the join itself can never
    fan out and the aggregate combines map-side: bounded at any key
    skew, the opposite of joining first and ranking later.
    ClickHouse's pick among equal-key rows is explicitly arbitrary
    ("any"); this translation PINS it to the lexicographically
    smallest row (struct comparison over the full row in column
    order), making results reproducible and oracle-checkable — any
    single match is a correct ANY result.

    ``RIGHT ANY`` mirrors: ALL right rows survive, each with at most
    one left match, so the LEFT side is the one deduped pre-join.
    ``FULL ANY`` follows ClickHouse's legacy
    ``any_join_distinct_right_table_keys=1`` semantics (the only mode
    in which ClickHouse accepts the form — modern servers raise "ANY
    FULL JOINs are not implemented"), made deterministic: EVERY left
    row survives with at most one right match (the right side — and
    ONLY the right side — dedupes to key cardinality), and each
    unmatched right KEY appears once with a NULL left leg.  Left-row
    multiplicity is never changed; a plain FULL OUTER against the
    key-cardinality right side delivers exactly that shape.

    Lexical scope (the guard in _rewrite_clauses raises otherwise):
    both sides plain identifiers, ON conditions ALL plain qualified
    column equalities (``a.k = b.k AND …``; USING desugars to that
    form first).  The non-deduped side (when there is one) stays the
    raw table — its qualified references resolve natively; a deduped
    side's references resolve as struct fields of its alias column
    (``SELECT *`` flattens via _flatten_owner_star, as for ASOF)."""
    while True:
        m = _ANY_PAT.search(code)
        if m is None:
            return code
        a_tbl, a_alias = m.group(1), m.group(2) or m.group(1)
        kw = (m.group(3) or m.group(4) or "INNER").upper()
        b_tbl, b_alias = m.group(5), m.group(6) or m.group(5)
        _guard_preceding_join(code, m.start(), "ANY")
        tail = code[m.end() :]
        blanked = _blank_parens(tail)
        tm = _ASOF_TERM.search(blanked)
        end = tm.start() if tm else len(tail)
        par = blanked.find(")")  # subquery boundary ends the ON list
        if par != -1 and par < end:
            end = par
        conds_sql = tail[:end]
        suffix = tail[end:]
        flat = _flatten_owner_star(code, m.start(), a_alias, b_alias)
        if flat is not None:
            code = flat
            continue
        parts: list[str] = []
        start = 0
        for am in re.finditer(r"\bAND\b", _blank_parens(conds_sql),
                              flags=re.IGNORECASE):
            parts.append(conds_sql[start : am.start()])
            start = am.end()
        parts.append(conds_sql[start:])
        l_keys: list[str] = []
        r_keys: list[str] = []
        for p in parts:
            em = re.fullmatch(
                r"\s*(\w+)\s*\.\s*(\w+)\s*=\s*(\w+)\s*\.\s*(\w+)\s*", p
            )
            if (
                em is None
                or a_alias == b_alias
                or {em.group(1), em.group(3)} != {a_alias, b_alias}
            ):
                return code  # unsupported form: the curated raise fires
            if em.group(1) == a_alias:
                l_keys.append(em.group(2))
                r_keys.append(em.group(4))
            else:
                l_keys.append(em.group(4))
                r_keys.append(em.group(2))
        gcols = ", ".join(f"__any_k{i}" for i in range(len(r_keys)))
        if kw == "FULL":
            # legacy FULL ANY: left multiplicity preserved (the left
            # side is struct-wrapped but NOT aggregated), right side
            # deduped to key cardinality, plain FULL OUTER on the keys
            # — unmatched right KEYS appear once with a NULL left leg
            lsel = ", ".join(
                f"{c} AS __any_lk{i}" for i, c in enumerate(l_keys)
            )
            rsel = ", ".join(
                f"{c} AS __any_k{i}" for i, c in enumerate(r_keys)
            )
            on = " AND ".join(
                f"__any_l.__any_lk{i} = __any_r.__any_k{i}"
                for i in range(len(r_keys))
            )
            rewritten = (
                f"(SELECT struct(*) AS {a_alias}, {lsel} FROM {a_tbl}) "
                f"AS __any_l "
                f"FULL JOIN "
                f"(SELECT min({b_alias}) AS {b_alias}, {gcols} FROM "
                f"(SELECT struct(*) AS {b_alias}, {rsel} FROM {b_tbl}) "
                f"AS __any_sr GROUP BY {gcols}) AS __any_r ON {on} "
            )
        elif kw == "RIGHT":
            # all RIGHT rows survive -> dedupe the LEFT side pre-join
            lsel = ", ".join(
                f"{c} AS __any_k{i}" for i, c in enumerate(l_keys)
            )
            on = " AND ".join(
                f"__any_l.__any_k{i} = {b_alias}.{rc}"
                for i, rc in enumerate(r_keys)
            )
            b_sql = f" AS {b_alias}" if m.group(6) else ""
            rewritten = (
                f"(SELECT min({a_alias}) AS {a_alias}, {gcols} FROM "
                f"(SELECT struct(*) AS {a_alias}, {lsel} FROM {a_tbl}) "
                f"AS __any_s GROUP BY {gcols}) AS __any_l "
                f"RIGHT JOIN {b_tbl}{b_sql} ON {on} "
            )
        else:
            rsel = ", ".join(
                f"{c} AS __any_k{i}" for i, c in enumerate(r_keys)
            )
            on = " AND ".join(
                f"{a_alias}.{lc} = __any_r.__any_k{i}"
                for i, lc in enumerate(l_keys)
            )
            join_kw = "LEFT JOIN" if kw == "LEFT" else "JOIN"
            alias_sql = f" AS {a_alias}" if m.group(2) else ""
            rewritten = (
                f"{a_tbl}{alias_sql} {join_kw} "
                f"(SELECT min({b_alias}) AS {b_alias}, {gcols} FROM "
                f"(SELECT struct(*) AS {b_alias}, {rsel} FROM {b_tbl}) "
                f"AS __any_s GROUP BY {gcols}) AS __any_r ON {on} "
            )
        code = code[: m.start()] + rewritten + suffix


def _rewrite_code(code: str, literals: tuple = ()) -> str:
    code = _desugar_strict_using(code)
    code = _rewrite_asof_join(code)
    code = _rewrite_any_join(code)
    code = _rewrite_array_literals(code)
    code = _rewrite_limit_by(code)
    code = _rewrite_with_totals(code)
    code = _rewrite_clauses(code)
    # ClickHouse's bare ``count()`` (Spark requires an argument)
    code = re.sub(r"\bcount\s*\(\s*\)", "count(*)", code, flags=re.IGNORECASE)
    for z, repl in _ZERO_ARG.items():
        code = code.replace(z, repl)
    code = _rewrite_param_aggs(code, literals)
    code = _rewrite_wraps(code, literals)
    for name, repl in _NAME_SWAPS.items():
        code = re.sub(rf"\b{name}(\s*\()", repl + r"\1", code)
    return code


def rewrite_final_tables(query: str, resolver) -> str:
    """Resolve ``FROM t FINAL`` / ``JOIN t FINAL`` table references.

    ``resolver(table_name) -> view_name | None``: the engine supplies
    a callback that registers a version-collapsed view of a known
    table (``Engine.table(name, final=True)``) and returns its name;
    ``None`` leaves the reference untouched so the translation's FINAL
    guard still raises with the Engine pointer for unknown tables.
    Quoted strings are never touched (the query is literal-masked with
    the same segment scan as the translator, and a masked SINGLE-quoted
    literal in table position is left alone — only backquoted
    identifiers name tables).  The rewritten view is ALWAYS aliased —
    to the query's own alias (``FROM t AS a FINAL`` / ``FROM t a
    FINAL``) or to the original table name — so qualified column
    references (``t.col``) keep resolving."""
    literals: list[str] = []
    masked_parts: list[str] = []
    for is_code, text in _segments(query):
        if is_code:
            masked_parts.append(text)
        else:
            masked_parts.append(f"\x01{len(literals)}\x01")
            literals.append(text)
    masked = "".join(masked_parts)
    # the optional alias word must not swallow a clause keyword (else
    # `FROM t WHERE final ...` would parse as alias=WHERE) nor the AS
    # keyword itself (else `FROM t AS final` would parse alias=AS)
    _kw = (
        r"(?!WHERE\b|PREWHERE\b|GROUP\b|ORDER\b|HAVING\b|LIMIT\b|ON\b|"
        r"USING\b|UNION\b|SETTINGS\b|INNER\b|LEFT\b|RIGHT\b|FULL\b|"
        r"CROSS\b|JOIN\b|SAMPLE\b|SELECT\b|FINAL\b|AS\b)"
    )
    pat = re.compile(
        r"\b(FROM|JOIN)\s+(" + _TABLE_REF + r")(?:\s+(?:AS\s+)?" + _kw + r"(\w+))?\s+FINAL\b",
        flags=re.IGNORECASE,
    )

    def sub(m: "re.Match[str]") -> str:
        name = m.group(2)
        lit_m = re.fullmatch(r"\x01(\d+)\x01", name)
        if lit_m:
            lit = literals[int(lit_m.group(1))]
            if not (lit.startswith("`") and lit.endswith("`")):
                return m.group(0)  # a string literal is not a table ref
            name = lit[1:-1].replace("``", "`")
        view = resolver(name)
        if view is None:
            return m.group(0)
        alias = m.group(3) or name.rsplit(".", 1)[-1]
        if not re.fullmatch(r"\w+", alias):
            alias = "`" + alias.replace("`", "``") + "`"
        return f"{m.group(1)} {view} AS {alias}"

    out = pat.sub(sub, masked)
    return re.sub(r"\x01(\d+)\x01", lambda m: literals[int(m.group(1))], out)


def clickhouse_to_spark_sql(
    query: str, column_types: dict[str, str] | None = None
) -> str:
    """Translate the documented ClickHouse SQL subset to Spark SQL.

    Quoted strings / backquoted identifiers are masked with sentinels
    first (they may contain parens and commas), the whole query is
    rewritten as one code stream, then the literals are restored.

    ``column_types`` (optional) maps plain column names to Spark DDL
    type strings (e.g. ``{"arr": "ARRAY<BIGINT>"}``) — the catalog
    context that lets ClickHouse's 2-arg ``arrayResize``/``arrayShift*``
    forms infer their type-default pad element for cataloged columns.
    Carried in a ContextVar for the duration of this call (reentrant
    and thread-safe — concurrent translations can't leak context)."""
    if column_types is not None:
        token = _COLUMN_TYPES.set(column_types)
        try:
            return clickhouse_to_spark_sql(query)
        finally:
            _COLUMN_TYPES.reset(token)
    literals: list[str] = []
    masked_parts: list[str] = []
    for is_code, text in _segments(query):
        if is_code:
            masked_parts.append(text)
        else:
            masked_parts.append(f"\x01{len(literals)}\x01")
            literals.append(text)
    out = "".join(masked_parts)
    # trailing SETTINGS clause (ClickHouse execution tuning — Spark's
    # equivalents are session confs, not query text), then trailing
    # FORMAT clause (client-side concern); either order, both optional.
    # Stripped while literals are still MASKED, so SETTINGS-shaped text
    # inside a string can never be consumed (a value may itself be a
    # masked literal sentinel, e.g. SETTINGS max_memory = '10G').
    # Stripped BEFORE the clause rewrites so LIMIT BY / WITH TOTALS
    # restructuring never has to reason about a trailing SETTINGS.
    _sv = r"(?:[\w.]+|\x01\d+\x01)"
    out = re.sub(
        rf"\s+SETTINGS\s+\w+\s*=\s*{_sv}(\s*,\s*\w+\s*=\s*{_sv})*(?=\s+FORMAT\b|\s*;?\s*$)",
        "",
        out,
        flags=re.IGNORECASE,
    )
    out = re.sub(r"\s+FORMAT\s+\w+\s*;?\s*$", "", out, flags=re.IGNORECASE)
    out = _rewrite_code(out, tuple(literals))
    out = re.sub(
        r"\x01(\d+)\x01", lambda m: literals[int(m.group(1))], out
    )
    return out
