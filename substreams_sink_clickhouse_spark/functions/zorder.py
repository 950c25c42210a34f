"""Z-order (Morton) clustering key for multi-column data skipping.

Parquet scans prune row groups by min/max statistics; a file sorted by
one column has useless stats for every other column.  Interleaving the
bits of several columns' rank positions gives a single sort key whose
ordering keeps ALL participating columns locally narrow — after
compaction, a filter on any Z-ordered column skips most files (the
standard lakehouse technique, e.g. Delta/Iceberg OPTIMIZE ZORDER BY).

Implementation is pure JVM expressions (no UDF, no shuffle beyond the
caller's):

1. per-column min/max from ONE tiny aggregate (broadcast literals via
   a crossJoin of the 1-row stats frame);
2. normalize each value to a ``bits``-wide integer rank
   ``(v - min) / (max - min) * (2^bits - 1)`` (numeric or date/
   timestamp via epoch; strings hash first — rank-by-hash still
   co-locates equal values);
3. interleave with a ``sequence``/``aggregate`` fold:
   bit ``i`` of column ``j`` lands at position ``i * n_cols + j``.

Min/max normalization (vs true quantile ranks) is deliberate: it needs
one cheap aggregate instead of a global sort/sample pass, it is fully
deterministic, and skew only degrades toward single-column clustering
behavior — acceptable for a maintenance operation that reruns on the
background-merge cadence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_numeric(df: DataFrame, col: str) -> Column:
    """Column as a double suitable for min/max ranking."""
    dt = df.schema[col].dataType
    if isinstance(dt, (T.TimestampType, T.DateType)):
        return F.unix_timestamp(F.col(col)).cast("double")
    if isinstance(dt, T.StringType):
        # rank by a stable 60-bit hash: no semantic order, but equal
        # values co-locate, which is what skipping needs for equality
        # predicates on string columns
        return F.conv(F.substring(F.md5(F.col(col)), 1, 15), 16, 10).cast("double")
    return F.col(col).cast("double")


def zorder_key(df: DataFrame, cols: list[str], bits: int | None = None) -> Column:
    """Morton key over ``cols`` (2+ columns; ``bits`` per column,
    default packs ~60 bits total)."""
    if len(cols) < 2:
        raise ValueError("zorder needs at least 2 columns (1 -> plain sort)")
    n = len(cols)
    if bits is None:
        bits = min(16, 60 // n)
    elif bits < 1 or bits * n > 63:
        # interleaved bit positions reach bits*n-1; past 62 the
        # pow(2.0, .)->long term saturates at Long.MaxValue and
        # silently corrupts the Morton order, so reject up front.
        raise ValueError(
            f"bits={bits} with {n} columns places interleaved bits past "
            f"position 62 (need 1 <= bits and bits*len(cols) <= 63; "
            f"max here is {63 // n})"
        )
    stats = df.agg(
        *[
            agg
            for c in cols
            for agg in (
                F.min(_as_numeric(df, c)).alias(f"__zmin_{c}"),
                F.max(_as_numeric(df, c)).alias(f"__zmax_{c}"),
            )
        ]
    )
    row = stats.first()
    top = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        lo = float(row[f"__zmin_{c}"] if row[f"__zmin_{c}"] is not None else 0.0)
        hi = float(row[f"__zmax_{c}"] if row[f"__zmax_{c}"] is not None else 0.0)
        span = (hi - lo) or 1.0
        rank = F.least(
            F.lit(top),
            F.greatest(
                F.lit(0),
                ((_as_numeric(df, c) - F.lit(lo)) / F.lit(span) * top).cast("long"),
            ),
        )
        # spread rank's bits to positions i*n + j.  shiftright() takes
        # a literal shift, so bit i extracts arithmetically:
        # floor(rank / 2^i) % 2 (exact — powers of two are exact
        # doubles and rank < 2^16).
        spread = F.aggregate(
            F.sequence(F.lit(0), F.lit(bits - 1)),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + (
                (rank.cast("double") / F.pow(F.lit(2.0), i.cast("double")))
                .cast("long")
                % 2
            )
            * F.pow(F.lit(2.0), (i * n + j).cast("double")).cast("long"),
        )
        key = key + spread
    return key
