"""``ORDER BY ... WITH FILL`` — ClickHouse's gap-filling sort modifier
as a structural DataFrame rewrite.

ClickHouse (docs/en/sql-reference/statements/select/order-by.md) fills
gaps in the sorted output of one column: between every adjacent pair of
result values it inserts ``prev + STEP, prev + 2*STEP, ...`` while
strictly before the next value; ``FROM`` extends the grid before the
first value and ``TO`` (exclusive) past the last.  Generated rows
carry each other column's TYPE DEFAULT (0 / '' / epoch), not NULL —
unless the column is listed in ``INTERPOLATE``, in which case it
carries the previous actual row's value forward.

This cannot be a lexical rewrite (functions/dialect.py): the inserted
rows' default values depend on the RESULT SCHEMA, which only exists
once the stripped query is planned.  So the dialect layer refuses
``WITH FILL`` in text-to-text translation, and ``Engine.sql`` routes
it here: ``strip_with_fill`` lexically removes the modifier and
returns a :class:`FillSpec`; ``apply_with_fill`` implements it on the
resulting DataFrame.

Supported surface:

* ``ORDER BY [g1 [ASC|DESC], ...,] k [ASC|DESC] WITH FILL
  [FROM e] [TO e] [STEP e] [INTERPOLATE (c1, c2, ...)]`` — the fill
  key must be the LAST sort key; preceding keys become fill GROUPS
  (each group's gaps fill independently, and generated rows inherit
  the group's key values — ClickHouse's multi-column sort behavior).
* DESC fill: STEP defaults to -1 (or a negative 1-day/1-second
  interval); ``FROM`` is then the upper starting bound and ``TO`` the
  lower exclusive bound, mirroring the ascending semantics.
* ``INTERPOLATE (c)`` carries the previous actual row's value into
  generated rows (ClickHouse's no-expression form; ``c AS expr``
  re-evaluation is refused with a workaround).

Scale design: the fill grid depends only on the DISTINCT values of
(groups, fill key), so the neighbor scan (``lead`` per group) runs on
the deduplicated key set — bounded by the output grid, not the input —
and each gap expands to its fill values as one ``sequence()`` array,
JVM-side.  With group keys the window partitions by group (parallel);
only the bare single-key form needs a single-partition window, and
that is bounded by the output spine.  The final global sort is the
query's own ORDER BY, which any ordered result pays regardless.

Remaining refusals (each raises with the workaround): expression fill
keys, WITH FILL on a non-final sort key or on several keys,
``INTERPOLATE (c AS expr)`` re-evaluation.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from substreams_sink_clickhouse_spark.functions.dialect import (
    _blank_parens,
    _match_paren,
    _segments,
    _split_top_commas,
)

__all__ = ["FillSpec", "strip_with_fill", "apply_with_fill"]


@dataclass(frozen=True)
class FillSpec:
    """Parsed WITH FILL modifier: raw SQL expression strings for the
    bounds (evaluated with ``F.expr`` at apply time, so literals and
    constant arithmetic both work)."""

    column: str
    from_: str | None = None
    to: str | None = None
    step: str | None = None
    #: preceding sort keys: (column, ascending) — fills group by these
    groups: tuple[tuple[str, bool], ...] = ()
    descending: bool = False
    #: columns that carry the previous actual row's value forward
    interpolate: tuple[str, ...] = ()
    #: a LIMIT that followed the filled ORDER BY — ClickHouse runs the
    #: FillingTransform as part of ORDER BY, BEFORE the limit, so the
    #: limit applies to the filled grid and must be deferred to
    #: apply_with_fill (a pre-fill limit would keep a different — and
    #: differently-sized — row prefix)
    limit: int | None = None

    def cache_token(self) -> str:
        return (
            f"WITH FILL {self.groups} {self.column} "
            f"{'DESC' if self.descending else 'ASC'} FROM {self.from_} "
            f"TO {self.to} STEP {self.step} INTERPOLATE {self.interpolate} "
            f"LIMIT {self.limit}"
        )


_FILL_ITEM = re.compile(
    r"^\s*(?P<expr>.+?)\s*(?P<dir>ASC|DESC)?\s+WITH\s+FILL"
    r"(?:\s+FROM\s+(?P<from>(?:(?!\s+TO\b|\s+STEP\b).)+))?"
    r"(?:\s+TO\s+(?P<to>(?:(?!\s+STEP\b).)+))?"
    r"(?:\s+STEP\s+(?P<step>.+?))?\s*$",
    flags=re.IGNORECASE | re.DOTALL,
)

_PLAIN_KEY = re.compile(r"^\s*(?P<col>[\w.]+|`[^`]+`)\s*(?P<dir>ASC|DESC)?\s*$", re.IGNORECASE)

#: keywords that terminate the ORDER BY clause at depth 0
_CLAUSE_END = re.compile(r"\b(LIMIT|SETTINGS|FORMAT|UNION|EXCEPT|INTERSECT)\b", re.IGNORECASE)


def strip_with_fill(query: str) -> tuple[str, FillSpec | None]:
    """Remove a ``WITH FILL`` modifier from the OUTERMOST ``ORDER BY``
    and return the stripped query plus its :class:`FillSpec` (or
    ``(query, None)`` unchanged when no fill is present at depth 0 —
    subquery fills are refused by the dialect guard downstream)."""
    # mask string/identifier literals, then blank paren bodies so the
    # scan below only sees the outermost query's clause structure
    literals: list[str] = []
    masked_parts: list[str] = []
    for is_code, text in _segments(query):
        if is_code:
            masked_parts.append(text)
        else:
            masked_parts.append(f"\x01{len(literals)}\x01")
            literals.append(text)
    masked = "".join(masked_parts)
    blanked = _blank_parens(masked)
    if not re.search(r"\bWITH\s+FILL\b", blanked, flags=re.IGNORECASE):
        return query, None
    ob_matches = list(re.finditer(r"\bORDER\s+BY\b", blanked, flags=re.IGNORECASE))
    if not ob_matches:
        raise ValueError("WITH FILL without an ORDER BY")
    ob = ob_matches[-1]
    end_m = _CLAUSE_END.search(blanked, ob.end())
    end = end_m.start() if end_m else len(masked)
    if re.search(r"\bWITH\s+FILL\b", blanked[ob.end() : end], flags=re.IGNORECASE) is None:
        raise ValueError(
            "WITH FILL must modify the outermost ORDER BY (fill inside "
            "a subquery re-sorts anyway: lift the ORDER BY ... WITH "
            "FILL to the outer query)"
        )

    def _restore(s: str | None) -> str | None:
        if s is None:
            return None
        return re.sub(r"\x01(\d+)\x01", lambda g: literals[int(g.group(1))], s).strip()

    clause = masked[ob.end() : end]
    # trailing INTERPOLATE (...) belongs to the fill, not the sort list
    interpolate: tuple[str, ...] = ()
    ip = re.search(r"\bINTERPOLATE\s*\(", clause, flags=re.IGNORECASE)
    if ip is not None:
        close = _match_paren(clause, ip.end() - 1)
        if clause[close + 1 :].strip():
            raise ValueError("INTERPOLATE (...) must end the ORDER BY clause")
        cols = _split_top_commas(clause[ip.end() : close])
        parsed = []
        for c in cols:
            if re.search(r"\bAS\b", c, flags=re.IGNORECASE):
                raise ValueError(
                    "INTERPOLATE (col AS expr) re-evaluates the expression "
                    "per generated row; only the carry-forward form "
                    "INTERPOLATE (col) is supported — compute the "
                    "expression over the filled result instead"
                )
            if not re.fullmatch(r"[\w.]+|`[^`]+`", c.strip()):
                raise ValueError(f"INTERPOLATE expects result columns, got {c!r}")
            parsed.append(_restore(c).strip("`"))
        interpolate = tuple(parsed)
        clause = clause[: ip.start()]

    items = _split_top_commas(clause)
    for it in items[:-1]:
        if re.search(r"\bWITH\s+FILL\b", it, flags=re.IGNORECASE):
            raise ValueError(
                "WITH FILL is supported on the FINAL sort key only "
                "(fill one spine; preceding keys become fill groups)"
            )
    m = _FILL_ITEM.match(items[-1])
    if m is None:
        raise ValueError(f"cannot parse WITH FILL modifier: {items[-1]!r}")
    groups = []
    for it in items[:-1]:
        gm = _PLAIN_KEY.match(it)
        if gm is None:
            raise ValueError(
                f"sort keys before WITH FILL must be result columns "
                f"(generated rows inherit their values), got {it!r}"
            )
        groups.append(
            (_restore(gm.group("col")).strip("`"),
             (gm.group("dir") or "ASC").upper() == "ASC")
        )
    expr = m.group("expr").strip()
    if not re.fullmatch(r"[\w.]+|\x01\d+\x01|`[^`]+`", expr):
        raise ValueError(
            "WITH FILL key must be a result column: alias the "
            "expression in the SELECT list and fill on the alias"
        )
    spec = FillSpec(
        column=_restore(expr).strip("`"),
        from_=_restore(m.group("from")),
        to=_restore(m.group("to")),
        step=_restore(m.group("step")),
        groups=tuple(groups),
        descending=(m.group("dir") or "").upper() == "DESC",
        interpolate=interpolate,
    )
    dir_kw = " DESC" if spec.descending else ""
    keys = ", ".join(
        f"{c}{'' if asc else ' DESC'}" for c, asc in groups
    )
    sort_text = f"{keys}, {expr}{dir_kw}" if keys else f"{expr}{dir_kw}"
    if end_m is None:
        # nothing follows the ORDER BY: drop it entirely — the fill
        # operator re-establishes the ordering, and keeping it here
        # would plan a useless pre-fill range exchange
        stripped = masked[: ob.start()] + " " + masked[end:]
    elif end_m.group(1).upper() == "LIMIT":
        # ClickHouse runs the FillingTransform as part of ORDER BY,
        # BEFORE the limit: `ORDER BY x WITH FILL FROM 0 TO 10 LIMIT 5`
        # returns the first 5 rows of the FILLED grid.  So the limit is
        # absorbed into the spec and applied after apply_with_fill;
        # leaving it on the stripped query would limit the pre-fill
        # result — a different (and differently-sized) prefix.
        lm = re.match(
            r"\s*LIMIT\s+(\d+)\s*((?:;|\s*(?:SETTINGS|FORMAT)\b.*)?\s*)$",
            masked[end:],
            flags=re.IGNORECASE | re.DOTALL,
        )
        if lm is None:
            raise ValueError(
                "WITH FILL supports only a plain trailing `LIMIT n` "
                "(applied to the filled grid, as ClickHouse does); for "
                "LIMIT n,m / OFFSET / LIMIT BY, wrap the filled query "
                "and paginate the result"
            )
        spec = FillSpec(
            column=spec.column, from_=spec.from_, to=spec.to, step=spec.step,
            groups=spec.groups, descending=spec.descending,
            interpolate=spec.interpolate, limit=int(lm.group(1)),
        )
        # the pre-fill sort no longer decides survivors — drop it
        stripped = masked[: ob.start()] + " " + lm.group(2)
    else:
        # SETTINGS/FORMAT/set-op follows: the sort order itself is
        # re-established by the fill, but the clause must stay
        stripped = masked[: ob.end()] + f" {sort_text} " + masked[end:]
    stripped = re.sub(r"\x01(\d+)\x01", lambda g: literals[int(g.group(1))], stripped)
    return stripped, spec


def _default_literal(dt: T.DataType) -> Column:
    """ClickHouse inserts the column TYPE'S default value in generated
    rows (0, '', 1970-01-01), not NULL (order-by.md examples)."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                       T.FloatType, T.DoubleType, T.DecimalType)):
        return F.lit(0).cast(dt)
    if isinstance(dt, T.StringType):
        return F.lit("")
    if isinstance(dt, T.BooleanType):
        return F.lit(False)
    if isinstance(dt, T.DateType):
        return F.to_date(F.lit("1970-01-01"))
    if isinstance(dt, T.TimestampType):
        return F.to_timestamp(F.lit("1970-01-01 00:00:00"))
    if isinstance(dt, T.ArrayType):
        return F.array().cast(dt)
    return F.lit(None).cast(dt)


def apply_with_fill(df: DataFrame, spec: FillSpec) -> DataFrame:
    """Insert the fill rows described by ``spec`` and return the result
    ordered by (groups, fill column).  See module docstring."""
    v = spec.column
    for c in (v, *(g for g, _ in spec.groups), *spec.interpolate):
        if c not in df.columns:
            raise ValueError(f"WITH FILL column {c!r} is not in the result: {df.columns}")
    if v in spec.interpolate or v in {g for g, _ in spec.groups}:
        raise ValueError("the fill key cannot also be a group/INTERPOLATE column")
    dt = df.schema[v].dataType
    integral = isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType))
    temporal = isinstance(dt, (T.DateType, T.TimestampType))
    if not (integral or temporal):
        raise ValueError(
            f"WITH FILL needs an integer, date, or timestamp key; "
            f"{v!r} is {dt.simpleString()} (bucket/round it first)"
        )
    desc = spec.descending
    if spec.step is not None:
        step = spec.step
        if integral and re.fullmatch(r"-?\d+", step.strip()):
            n = int(step)
            if n == 0 or ((n > 0) == desc):
                raise ValueError(
                    f"WITH FILL STEP {step} does not move toward the "
                    f"{'descending' if desc else 'ascending'} sort"
                )
    elif integral:
        step = "-1" if desc else "1"
    elif isinstance(dt, T.DateType):
        step = "INTERVAL -1 DAY" if desc else "INTERVAL 1 DAY"
    else:
        step = "INTERVAL -1 SECOND" if desc else "INTERVAL 1 SECOND"
    if temporal and not re.match(r"\s*INTERVAL\b", step, flags=re.IGNORECASE):
        raise ValueError(
            f"WITH FILL STEP over {dt.simpleString()} must be an "
            "INTERVAL (e.g. STEP INTERVAL 1 HOUR)"
        )

    q = f"`{v}`"
    cmp = ">" if desc else "<"  # "strictly before" in sort direction

    # Every gap expands as one JVM-side sequence(); the strict bound is
    # enforced by filter() because sequence()'s stop is inclusive.
    # Guards keep sequence() boundaries ordered relative to the step
    # sign (it raises otherwise).
    def gap(start: str, stop: str) -> str:
        return (
            f"CASE WHEN ({start}) {cmp} ({stop}) THEN "
            f"filter(sequence({start}, {stop}, {step}), x -> x {cmp} ({stop})) "
            f"ELSE array() END"
        )

    gcols = [g for g, _ in spec.groups]
    key = F.col(v).desc() if desc else F.col(v).asc()
    w = Window.partitionBy(*gcols).orderBy(key)
    vals = (
        df.select(*gcols, v)
        .where(F.col(v).isNotNull())
        .distinct()
        .select(
            *gcols,
            F.col(v),
            F.lead(v).over(w).alias("__next"),
            F.row_number().over(w).alias("__rn"),
        )
    )
    empty = F.array().cast(T.ArrayType(dt))
    # three independent segments so a single-value result with both
    # bounds still gets prefix AND suffix; mid is array() on the last
    # row (its CASE guard sees a NULL __next).  TO clamps every
    # generated value (ClickHouse stops filling at TO — actual rows
    # beyond it are still emitted, just never filled toward).
    # NB: least()/greatest() SKIP nulls in Spark, so the last row
    # (__next NULL) must short-circuit to NULL or the mid gap would
    # duplicate the TO-suffix.
    clamp = "greatest" if desc else "least"
    mid_stop = (
        "`__next`"
        if spec.to is None
        else f"IF(`__next` IS NULL, NULL, {clamp}(`__next`, ({spec.to})))"
    )
    mid = F.expr(gap(f"{q} + ({step})", mid_stop))
    pre = (
        F.when(F.col("__rn") == 1, F.expr(gap(f"({spec.from_})", q))).otherwise(empty)
        if spec.from_ is not None
        else empty
    )
    suf = (
        F.when(
            F.col("__next").isNull(), F.expr(gap(f"{q} + ({step})", f"({spec.to})"))
        ).otherwise(empty)
        if spec.to is not None
        else empty
    )
    spine = vals.select(*gcols, F.explode(F.concat(pre, mid, suf)).alias(v))

    def _gen_col(c: str) -> Column:
        if c == v:
            return F.col(v).cast(dt).alias(c)
        if c in gcols:
            return F.col(c).alias(c)  # generated rows inherit the group
        if c in spec.interpolate:
            return F.lit(None).cast(df.schema[c].dataType).alias(c)
        return _default_literal(df.schema[c].dataType).alias(c)

    generated = spine.select(*[_gen_col(c) for c in df.columns])
    flagged = df.withColumn("__gen", F.lit(False)).unionByName(
        generated.withColumn("__gen", F.lit(True))
    )
    if spec.interpolate:
        # carry the previous ACTUAL row's value (including an actual
        # NULL) into generated rows; rows before any actual row get the
        # type default, matching the uninitialized-fill behavior
        wi = (
            Window.partitionBy(*gcols)
            .orderBy(key)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for c in spec.interpolate:
            src = F.when(~F.col("__gen"), F.struct(F.col(c).alias("v")))
            prev = F.last(src, ignorenulls=True).over(wi)
            flagged = flagged.withColumn(
                c,
                F.when(~F.col("__gen"), F.col(c)).otherwise(
                    F.when(prev.isNull(), _default_literal(df.schema[c].dataType))
                    .otherwise(prev["v"])
                ),
            )
    order = [
        (F.col(g).asc() if asc else F.col(g).desc()) for g, asc in spec.groups
    ] + [key]
    out = flagged.drop("__gen").orderBy(*order)
    if spec.limit is not None:
        # the LIMIT that followed the filled ORDER BY: ClickHouse
        # limits AFTER the FillingTransform, so it applies to the
        # filled grid (strip_with_fill absorbed it from the query)
        out = out.limit(spec.limit)
    return out
