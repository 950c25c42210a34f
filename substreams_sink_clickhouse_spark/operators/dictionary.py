"""ClickHouse external-dictionary parity (``dictGet`` /
``dictGetOrDefault``).

ClickHouse dictionaries are RAM-resident key→attribute tables
replicated to every server and consulted per row *without a join* —
the standard enrichment idiom for tables the reference sinks
(/root/reference/README.md:29-52 shows its users querying the sunk
tables with ClickHouse SQL, where dictGet is the canonical dimension
lookup).  Spark-first analogs, in preference order:

* :func:`dict_get` — for dictionaries that fit on the driver (the
  ClickHouse HASHED/FLAT layouts are RAM-bound by definition), build a
  JVM ``map`` literal once and index it per row.  The literal ships
  inside the serialized plan to every executor: zero shuffle, zero
  join, no Python in the row path — exactly the replicated-hash-table
  execution ClickHouse uses.
* :func:`dict_join` — broadcast-hash-join fallback for dictionaries
  too large to inline in the plan text (ClickHouse ``cached`` /
  ``direct`` layouts).  Still no shuffle of the probe side.

Scale: the literal-map path is O(|dict|) plan size — capped by
``MAX_INLINE_ENTRIES``; beyond the cap, callers get the broadcast
join, which Spark distributes via the torrent broadcast mechanism
rather than the task closure.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from substreams_sink_clickhouse_spark.operators.spec import QuerySpec
from substreams_sink_clickhouse_spark.sources.tables import load_table

#: Above this many entries, refuse to inline the dictionary into the
#: plan (plan-size blowup; use dict_join instead).
MAX_INLINE_ENTRIES = 10_000


class DictionaryTooLargeError(ValueError):
    pass


def dict_get(
    dict_df: DataFrame,
    key_col: str,
    value_col: str,
    default: Optional[str] = None,
) -> Callable[[Column], Column]:
    """Build a ``dictGet`` lookup from a small dimension DataFrame.

    Returns ``lookup(probe_col) -> Column`` resolving each probe key to
    the dictionary attribute (``default`` when absent, mirroring
    ``dictGetOrDefault``; NULL when no default is given).

    The dictionary is collected ONCE (it is dictionary-sized by
    contract) and embedded as a ``CreateMap`` literal — constant-folded
    JVM-side, replicated with the plan, no join or shuffle in the
    query.  Raises :class:`DictionaryTooLargeError` above
    ``MAX_INLINE_ENTRIES`` — use :func:`dict_join` there.
    """
    rows = dict_df.select(key_col, value_col).limit(MAX_INLINE_ENTRIES + 1).collect()
    if len(rows) > MAX_INLINE_ENTRIES:
        raise DictionaryTooLargeError(
            f"dictionary {key_col}->{value_col} exceeds {MAX_INLINE_ENTRIES} "
            "entries; use dict_join (broadcast) instead"
        )
    pairs: list[Column] = []
    for r in rows:
        pairs.append(F.lit(r[0]))
        pairs.append(F.lit(r[1]))
    mapping = F.create_map(*pairs)

    def lookup(probe: Column) -> Column:
        got = mapping[probe]
        if default is not None:
            return F.coalesce(got, F.lit(default))
        return got

    return lookup


def dict_join(
    fact: DataFrame,
    dict_df: DataFrame,
    fact_key: str,
    dict_key: str,
    value_col: str,
    out_col: str,
    default: Optional[str] = None,
) -> DataFrame:
    """``dictGet`` as a broadcast left join: enrich ``fact`` with
    ``out_col`` = dictionary attribute (``default`` for misses).  The
    fact side never shuffles; the dictionary broadcasts once per
    stage."""
    dim = F.broadcast(dict_df.select(F.col(dict_key), F.col(value_col).alias(out_col)))
    joined = fact.join(dim, fact[fact_key] == dim[dict_key], "left").drop(dict_key)
    if default is not None:
        joined = joined.withColumn(out_col, F.coalesce(F.col(out_col), F.lit(default)))
    return joined


# ------------------------------------------------------------ gate query

def _q59_dict_get(spark: SparkSession, sf: str) -> DataFrame:
    """Customer enrichment through a nation dictionary — the ClickHouse
    ``dictGet('nations', 'n_name', c_nationkey)`` idiom.  The plan has
    NO join: one literal-map projection + one aggregation shuffle.
    """
    nation = load_table(spark, sf, "nation")
    cust = load_table(spark, sf, "customer")
    lookup = dict_get(nation, "n_nationkey", "n_name", default="<unknown>")
    # avg-balance rounding via exact integer cents (round 12): acctbal
    # carries exactly 2 decimals, so per-row cents are unambiguous and
    # sum_cents/n is an exact rational both engines round identically
    # (half-away-from-zero on an exactly-representable k.5).  The old
    # round(avg(double), 2) sat on a representation boundary at one
    # sf0.001 group (4201.315: Spark's shortest-repr HALF_UP said .32,
    # DuckDB's binary value said .31); values at sf0.01/sf0.1 are
    # verified identical under both formulations (0 diffs).
    return (
        cust.select(
            lookup(F.col("c_nationkey")).alias("nation"),
            F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (
                F.round(F.sum("cents").cast("double") / F.count(F.lit(1)))
                / F.lit(100.0)
            ).alias("avg_bal"),
        )
        .orderBy("nation")
    )


_Q59_ORACLE = """
WITH enriched AS (
  SELECT coalesce(n_name, '<unknown>') AS nation,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey)
SELECT nation, count(*) AS n_customers,
       round(CAST(sum(cents) AS DOUBLE) / count(*)) / 100.0 AS avg_bal
FROM enriched GROUP BY nation ORDER BY nation
"""


SPECS: list[QuerySpec] = [
    QuerySpec(
        "q59_dict_get",
        "dictGet dictionary lookup (literal map, no join)",
        _q59_dict_get,
        _Q59_ORACLE,
    ),
]
