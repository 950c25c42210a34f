"""``ORDER BY ... WITH FILL`` — ClickHouse's gap-filling sort modifier
as a structural DataFrame rewrite.

ClickHouse (docs/en/sql-reference/statements/select/order-by.md) fills
gaps in the sorted output of one column: between every adjacent pair of
result values it inserts ``prev + STEP, prev + 2*STEP, ...`` while
strictly less than the next value; ``FROM`` extends the grid below the
first value and ``TO`` (exclusive) above the last.  Generated rows
carry each other column's TYPE DEFAULT (0 / '' / epoch), not NULL —
that is the observable ClickHouse behavior this module reproduces.

This cannot be a lexical rewrite (functions/dialect.py): the inserted
rows' default values depend on the RESULT SCHEMA, which only exists
once the stripped query is planned.  So the dialect layer refuses
``WITH FILL`` in text-to-text translation, and ``Engine.sql`` routes
it here: ``strip_with_fill`` lexically removes the modifier and
returns a :class:`FillSpec`; ``apply_with_fill`` implements it on the
resulting DataFrame.

Scale design: the fill grid depends only on the DISTINCT values of the
fill column, so the neighbor scan (``lead`` over a global sort) runs
on the deduplicated value set — bounded by the output grid, not the
input — and each gap expands to its fill values as one ``sequence()``
array, JVM-side.  The final global sort is the query's own ORDER BY,
which any single-column ordered result pays regardless.

Deliberate v1 restrictions (each raises with the workaround):
multi-key ORDER BY, DESC fill, ``INTERPOLATE``, and expression (non-
column) fill keys.  These are the rare forms; the reference's users'
dashboard queries are single-key ascending time/number spines.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from substreams_sink_clickhouse_spark.functions.dialect import (
    _blank_parens,
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

    def cache_token(self) -> str:
        return f"WITH FILL {self.column} FROM {self.from_} TO {self.to} STEP {self.step}"


_FILL_ITEM = re.compile(
    r"^\s*(?P<expr>.+?)\s*(?P<dir>ASC|DESC)?\s+WITH\s+FILL"
    r"(?:\s+FROM\s+(?P<from>(?:(?!\s+TO\b|\s+STEP\b).)+))?"
    r"(?:\s+TO\s+(?P<to>(?:(?!\s+STEP\b).)+))?"
    r"(?:\s+STEP\s+(?P<step>.+?))?\s*$",
    flags=re.IGNORECASE | re.DOTALL,
)

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
    if re.search(r"\bINTERPOLATE\b", blanked, flags=re.IGNORECASE):
        raise ValueError(
            "WITH FILL ... INTERPOLATE is not supported: compute the "
            "interpolation over the filled result with a window "
            "expression (the q119_interpolate shape)"
        )
    ob_matches = list(re.finditer(r"\bORDER\s+BY\b", blanked, flags=re.IGNORECASE))
    if not ob_matches:
        raise ValueError("WITH FILL without an ORDER BY")
    ob = ob_matches[-1]
    end_m = _CLAUSE_END.search(blanked, ob.end())
    end = end_m.start() if end_m else len(masked)
    clause = masked[ob.end() : end]
    fill_at = re.search(r"\bWITH\s+FILL\b", blanked[ob.end() : end], flags=re.IGNORECASE)
    if fill_at is None:
        raise ValueError(
            "WITH FILL must modify the outermost ORDER BY (fill inside "
            "a subquery re-sorts anyway: lift the ORDER BY ... WITH "
            "FILL to the outer query)"
        )
    items = _split_top_commas(clause)
    if len(items) != 1:
        raise ValueError(
            "WITH FILL over a multi-key ORDER BY is not supported: "
            "fill the single spine key, then re-sort the filled result"
        )
    m = _FILL_ITEM.match(items[0])
    if m is None:
        raise ValueError(f"cannot parse WITH FILL modifier: {items[0]!r}")
    if (m.group("dir") or "").upper() == "DESC":
        raise ValueError(
            "WITH FILL DESC is not supported: fill ascending, then "
            "ORDER BY ... DESC the filled result"
        )
    expr = m.group("expr").strip()
    if not re.fullmatch(r"[\w.]+|\x01\d+\x01", expr):
        raise ValueError(
            "WITH FILL key must be a result column: alias the "
            "expression in the SELECT list and fill on the alias"
        )

    def _restore(s: str | None) -> str | None:
        if s is None:
            return None
        return re.sub(r"\x01(\d+)\x01", lambda g: literals[int(g.group(1))], s).strip()

    spec = FillSpec(
        column=_restore(expr).strip("`"),
        from_=_restore(m.group("from")),
        to=_restore(m.group("to")),
        step=_restore(m.group("step")),
    )
    stripped = masked[: ob.end()] + f" {expr} " + masked[end:]
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
    ordered by the fill column.  See module docstring for semantics."""
    v = spec.column
    if v not in df.columns:
        raise ValueError(f"WITH FILL column {v!r} is not in the result: {df.columns}")
    dt = df.schema[v].dataType
    integral = isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType))
    temporal = isinstance(dt, (T.DateType, T.TimestampType))
    if not (integral or temporal):
        raise ValueError(
            f"WITH FILL needs an integer, date, or timestamp key; "
            f"{v!r} is {dt.simpleString()} (bucket/round it first)"
        )
    if spec.step is not None:
        step = spec.step
    elif integral:
        step = "1"
    elif isinstance(dt, T.DateType):
        step = "INTERVAL 1 DAY"  # ClickHouse Date default step = 1 day
    else:
        step = "INTERVAL 1 SECOND"  # DateTime default step = 1 second
    if temporal and not re.match(r"\s*INTERVAL\b", step, flags=re.IGNORECASE):
        raise ValueError(
            f"WITH FILL STEP over {dt.simpleString()} must be an "
            "INTERVAL (e.g. STEP INTERVAL 1 HOUR)"
        )

    q = f"`{v}`"
    # Every gap expands as one JVM-side sequence(); the strict upper
    # bound is enforced by filter() because sequence()'s stop is
    # inclusive.  Guards keep sequence() boundaries ordered (it raises
    # on start > stop with a positive step).
    def gap(start: str, stop: str) -> str:
        return (
            f"CASE WHEN ({start}) < ({stop}) THEN "
            f"filter(sequence({start}, {stop}, {step}), x -> x < ({stop})) "
            f"ELSE array() END"
        )

    w = Window.orderBy(v)
    vals = (
        df.select(v)
        .where(F.col(v).isNotNull())
        .distinct()
        .select(
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
    # NB: least() SKIPS nulls in Spark, so the last row (__next NULL)
    # must short-circuit to NULL or the mid gap would duplicate the
    # TO-suffix
    mid_stop = (
        "`__next`"
        if spec.to is None
        else f"IF(`__next` IS NULL, NULL, least(`__next`, ({spec.to})))"
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
    spine = vals.select(F.explode(F.concat(pre, mid, suf)).alias(v))
    generated = spine.select(
        *[
            F.col(v).cast(dt).alias(c) if c == v else _default_literal(df.schema[c].dataType).alias(c)
            for c in df.columns
        ]
    )
    return df.unionByName(generated).orderBy(v)
