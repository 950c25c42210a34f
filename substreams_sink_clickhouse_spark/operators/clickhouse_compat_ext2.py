"""ClickHouse function-family parity, third batch (q104–q107).

Continues ``clickhouse_compat_ext.py`` (the reference's analytics
surface IS ClickHouse SQL — /root/reference/README.md:29-52):

* ``q104_uniq_upto``       — ``uniqUpTo(N)``: exact distinct count
  saturating at N+1 (the "more than N?" cardinality probe).
* ``q105_moving_sum``      — ``groupArrayMovingSum(k)``: per-group
  moving window sums over the ordinal-ordered series, rendered as a
  fixed-scale CSV string (driver-canonicalizable).
* ``q106_edit_distance``   — ``editDistance`` (Levenshtein) between
  each part name and a probe string, plus ``startsWith``/``endsWith``.
* ``q107_delta_sum``       — ``deltaSum``: sum of positive deltas of an
  ordinal-ordered series per key (counter-reset-tolerant rate).

Scale notes: q104/q107 are single hash aggregates with map-side
partials (q107's lag is a window inside the key partition — one
shuffle, partition-local sort); q105 sorts within groups only;
q106 is a pure row-level expression in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from substreams_sink_clickhouse_spark.operators.spec import QuerySpec
from substreams_sink_clickhouse_spark.sources.tables import load_table

UNIQ_UPTO_N = 5


def _q104_uniq_upto(spark: SparkSession, sf: str) -> DataFrame:
    """uniqUpTo(N): exact distinct saturating at N+1 — ClickHouse's
    bounded-state cardinality probe.  Expressed as least(countDistinct,
    N+1): Catalyst's distinct aggregate expands map-side, and the
    saturation means state per group is bounded by N+1 at any scale."""
    e = load_table(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.least(
            F.countDistinct("user_id"), F.lit(UNIQ_UPTO_N + 1)
        ).alias("uniq_upto"),
        F.count(F.lit(1)).alias("n"),
    )


_Q104_ORACLE = f"""
SELECT event_type,
       least(count(DISTINCT user_id), {UNIQ_UPTO_N + 1}) AS uniq_upto,
       count(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""

MOVING_K = 3


def _q105_moving_sum(spark: SparkSession, sf: str) -> DataFrame:
    """groupArrayMovingSum(k) over each user's ordinal-ordered values:
    a bounded ROWS frame window inside the user partition (one
    shuffle), results rendered as DECIMAL-CSV for the driver."""
    e = load_table(spark, sf, "events").filter(F.col("user_id") < 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(-(MOVING_K - 1), 0)
    )
    per_row = e.select(
        "user_id",
        "event_id",
        F.sum("value").over(w).alias("mv"),
    )
    return per_row.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("event_id", F.col("mv")))
                ),
                lambda s: s["mv"].cast("decimal(18,2)").cast("string"),
            ),
            ",",
        ).alias("moving_sums")
    )


_Q105_ORACLE = f"""
WITH m AS (
  SELECT user_id, event_id,
         sum(value) OVER (PARTITION BY user_id ORDER BY event_id
                          ROWS BETWEEN {MOVING_K - 1} PRECEDING AND CURRENT ROW) AS mv
  FROM events WHERE user_id < 20)
SELECT user_id,
       list_aggregate(
         list_transform(list_sort(list({{'event_id': event_id, 'mv': mv}})),
                        s -> CAST(CAST(s.mv AS DECIMAL(18,2)) AS VARCHAR)),
         'string_agg', ',') AS moving_sums
FROM m GROUP BY user_id ORDER BY user_id
"""


def _q106_edit_distance(spark: SparkSession, sf: str) -> DataFrame:
    """editDistance/levenshtein + startsWith/endsWith: row-local string
    metrics against a probe term — whole-stage codegen, zero shuffle
    before the top-k."""
    p = load_table(spark, sf, "part")
    return (
        p.select(
            "p_partkey",
            F.levenshtein(F.col("p_type"), F.lit("PROMO BURNISHED BRASS")).alias(
                "edist"
            ),
            F.col("p_type").startswith("PROMO").cast("int").alias("is_promo"),
            F.col("p_type").endswith("BRASS").cast("int").alias("is_brass"),
        )
        .orderBy("edist", "p_partkey")
        .limit(100)
    )


_Q106_ORACLE = """
SELECT p_partkey,
       levenshtein(p_type, 'PROMO BURNISHED BRASS') AS edist,
       CAST(starts_with(p_type, 'PROMO') AS INT) AS is_promo,
       CAST(ends_with(p_type, 'BRASS') AS INT) AS is_brass
FROM part ORDER BY edist, p_partkey LIMIT 100
"""


def _q107_delta_sum(spark: SparkSession, sf: str) -> DataFrame:
    """deltaSum: per-user sum of positive deltas along the
    event-ordered value series (monotone-counter rate extraction,
    reset-tolerant).  lag() inside the user partition, then one
    algebraic aggregate."""
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    deltas = e.select(
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("d"),
    )
    return (
        deltas.groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.when(F.col("d") > 0, F.col("d")).otherwise(0.0)), 2
            ).alias("delta_sum")
        )
        .filter(F.col("user_id") < 50)
    )


_Q107_ORACLE = """
WITH d AS (
  SELECT user_id,
         value - lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS d
  FROM events)
SELECT user_id,
       round(sum(CASE WHEN d > 0 THEN d ELSE 0 END), 2) AS delta_sum
FROM d WHERE user_id < 50 GROUP BY user_id ORDER BY user_id
"""


SPECS = [
    QuerySpec(
        "q104_uniq_upto",
        "uniqUpTo(N) saturating distinct count",
        _q104_uniq_upto,
        _Q104_ORACLE,
    ),
    QuerySpec(
        "q105_moving_sum",
        "groupArrayMovingSum(k) per-group moving sums (CSV-rendered)",
        _q105_moving_sum,
        _Q105_ORACLE,
    ),
    QuerySpec(
        "q106_edit_distance",
        "editDistance/startsWith/endsWith string metrics",
        _q106_edit_distance,
        _Q106_ORACLE,
    ),
    QuerySpec(
        "q107_delta_sum",
        "deltaSum positive-delta rate per key",
        _q107_delta_sum,
        _Q107_ORACLE,
    ),
]


def _q108_with_totals(spark: SparkSession, sf: str) -> DataFrame:
    """``GROUP BY ... WITH TOTALS`` — ClickHouse emits the per-group
    rows plus one extra row aggregating everything.  Expressed as a
    rollup filtered to exactly those two grouping levels (Catalyst
    expands rollup map-side; no second scan), with the totals row
    flagged the way clients detect it (NULL key -> 'TOTALS')."""
    o = load_table(spark, sf, "orders")
    g = (
        o.rollup("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("TOTALS")).alias("status"),
            "n",
            "revenue",
        )
    )
    return g


_Q108_ORACLE = """
SELECT coalesce(o_orderstatus, 'TOTALS') AS status,
       count(*) AS n, round(sum(o_totalprice), 2) AS revenue
FROM orders GROUP BY ROLLUP (o_orderstatus) ORDER BY status
"""


SPECS.append(
    QuerySpec(
        "q108_with_totals",
        "GROUP BY WITH TOTALS via single-dimension rollup",
        _q108_with_totals,
        _Q108_ORACLE,
    )
)


def _q109_time_weighted_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Time-weighted average (the ClickHouse ``avgWeighted`` pattern
    over event durations): each reading holds until the next one, so
    its weight is the seconds to the user's next event; the last
    reading of a series carries no duration and drops out.  One lead()
    window inside the user partition + one algebraic aggregate."""
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Exact microsecond durations: the fixture carries sub-second ts,
    # and second-level truncation (Spark) vs rounding (DuckDB) would
    # diverge.  TIMESTAMP_NTZ -> TIMESTAMP is an identity instant under
    # the engine's pinned UTC session.
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    step = e.select(
        "user_id",
        "value",
        (us(F.lead("ts").over(w)) - us(F.col("ts"))).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    return (
        step.groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("dur_us")) / F.sum("dur_us"), 4
            ).alias("twa"),
            F.sum("dur_us").alias("span_us"),
        )
        .filter(F.col("user_id") < 40)
    )


_Q109_ORACLE = """
WITH s AS (
  SELECT user_id, value,
         epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS dur_us
  FROM events)
SELECT user_id,
       round(sum(value * dur_us) / sum(dur_us), 4) AS twa,
       CAST(sum(dur_us) AS BIGINT) AS span_us
FROM s WHERE dur_us IS NOT NULL AND user_id < 40
GROUP BY user_id ORDER BY user_id
"""


SPECS.append(
    QuerySpec(
        "q109_time_weighted_avg",
        "Time-weighted average per key (hold-until-next semantics)",
        _q109_time_weighted_avg,
        _Q109_ORACLE,
    )
)


def _q110_array_enumerate(spark: SparkSession, sf: str) -> DataFrame:
    """``arrayEnumerate`` / ``arrayEnumerateUniq``: 1-based position
    and per-value occurrence number inside each array — row-local
    higher-order lambdas (the occurrence scan is O(k^2) over k<=~20
    words, constant at any corpus size), rendered as CSV."""
    p = load_table(spark, sf, "part").filter(F.col("p_partkey") <= 200)
    words = F.split("p_name", " ")
    enum = F.expr(
        "array_join(transform(split(p_name, ' '), (w, i) -> CAST(i + 1 AS STRING)), ',')"
    )
    enum_uniq = F.expr(
        "array_join(transform(split(p_name, ' '), (w, i) -> "
        "CAST(size(filter(slice(split(p_name, ' '), 1, i + 1), x -> x = w)) AS STRING)), ',')"
    )
    return p.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        enum.alias("enum"),
        enum_uniq.alias("enum_uniq"),
    )


_Q110_ORACLE = """
SELECT p_partkey,
       CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
       list_aggregate(list_transform(range(1, len(string_split(p_name, ' ')) + 1),
                                     i -> CAST(i AS VARCHAR)), 'string_agg', ',') AS enum,
       list_aggregate(list_transform(range(1, len(string_split(p_name, ' ')) + 1),
                      i -> CAST(len(list_filter(string_split(p_name, ' ')[1:i],
                                                x -> x = string_split(p_name, ' ')[i])) AS VARCHAR)),
                      'string_agg', ',') AS enum_uniq
FROM part WHERE p_partkey <= 200 ORDER BY p_partkey
"""


SPECS.append(
    QuerySpec(
        "q110_array_enumerate",
        "arrayEnumerate/arrayEnumerateUniq position + occurrence numbering",
        _q110_array_enumerate,
        _Q110_ORACLE,
    )
)


def _q129_moving_avg(spark: SparkSession, sf: str) -> DataFrame:
    """groupArrayMovingAvg(k): the moving-average sibling of q105's
    moving sum — same bounded ROWS frame in the user partition, mean
    instead of sum, DECIMAL-CSV rendering for the driver."""
    e = load_table(spark, sf, "events").filter(F.col("user_id") < 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(-(MOVING_K - 1), 0)
    )
    per_row = e.select(
        "user_id",
        "event_id",
        F.avg("value").over(w).alias("mv"),
    )
    return per_row.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("event_id", F.col("mv")))),
                lambda s: s["mv"].cast("decimal(18,4)").cast("string"),
            ),
            ",",
        ).alias("moving_avgs")
    )


_Q129_ORACLE = f"""
WITH m AS (
  SELECT user_id, event_id,
         avg(value) OVER (PARTITION BY user_id ORDER BY event_id
                          ROWS BETWEEN {MOVING_K - 1} PRECEDING AND CURRENT ROW) AS mv
  FROM events WHERE user_id < 20)
SELECT user_id,
       string_agg(CAST(CAST(mv AS DECIMAL(18,4)) AS VARCHAR), ',' ORDER BY event_id)
         AS moving_avgs
FROM m GROUP BY user_id
"""


SPECS.append(
    QuerySpec(
        "q129_moving_avg",
        "groupArrayMovingAvg(k): bounded-frame mean inside the key partition",
        _q129_moving_avg,
        _Q129_ORACLE,
    )
)
