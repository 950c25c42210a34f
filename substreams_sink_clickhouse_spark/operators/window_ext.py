"""Window/array-semantics completions (q92–q95).

Last gaps in the ClickHouse-user query surface (the reference
delegates all querying to ClickHouse SQL, /root/reference/README.md:29-52):

* ``q92_array_join_outer``  — ``LEFT ARRAY JOIN`` (rows with empty
  arrays survive with NULL element) via ``posexplode_outer``.
* ``q93_ignore_nulls``      — ``first_value/last_value ... IGNORE
  NULLS`` / ClickHouse ``-OrNull``+``anyLast`` gap-filling idiom.
* ``q94_percentile_disc``   — ``quantileExact`` discrete convention
  (smallest value whose cumulative rank reaches the quantile) by rank
  arithmetic — no interpolation, engine-convention-free.
* ``q95_multi_positions``   — ``multiSearchAllPositions``: per-needle
  match positions as an int array.

Scale notes: q92/q95 are row-local fan-out/projections (no shuffle
until the final aggregate/sort); q93 sorts within user partitions
only; q94 is the q38_median shape — one partition-local sort per
group key feeding rank arithmetic, never a global collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from substreams_sink_clickhouse_spark.operators.spec import QuerySpec
from substreams_sink_clickhouse_spark.sources.tables import load_table


# -------------------------------------------------- LEFT ARRAY JOIN

def _q92_array_join_outer(spark: SparkSession, sf: str) -> DataFrame:
    """LEFT ARRAY JOIN: explode each document's long words (>= 9
    chars); documents with NO long word keep one row with NULL word —
    exactly ClickHouse's LEFT ARRAY JOIN row-preservation rule, via
    ``posexplode_outer`` on an empty-able filtered array."""
    d = load_table(spark, sf, "documents")
    longs = F.filter(F.split("text", " "), lambda x: F.length(x) >= 9)
    return (
        d.select("doc_id", F.posexplode_outer(longs).alias("pos", "word"))
        .select("doc_id", "pos", "word")
        .orderBy("doc_id", "pos")
        .limit(800)
    )


_Q92_ORACLE = """
SELECT d.doc_id, u.e.pos AS pos, u.e.word AS word
FROM (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> length(x) >= 9) AS ws
  FROM documents) d,
LATERAL unnest(CASE WHEN len(ws) = 0 THEN [{'pos': NULL, 'word': NULL}]
               ELSE list_transform(range(1, len(ws) + 1),
                                   i -> {'pos': i - 1, 'word': ws[i]}) END) u(e)
ORDER BY doc_id, pos
LIMIT 800
"""


# ----------------------------------------------------- IGNORE NULLS

def _q93_ignore_nulls(spark: SparkSession, sf: str) -> DataFrame:
    """first/last IGNORE NULLS: carry the last non-null 'purchase'
    value forward along each user's event history (the gap-fill idiom
    ClickHouse spells ``anyLastOrNull`` over a sorted group)."""
    e = load_table(spark, sf, "events")
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("pv", pv)
        .select(
            "event_id",
            "user_id",
            F.round(F.last("pv", ignorenulls=True).over(w), 4).alias("last_purchase"),
            F.round(F.first("pv", ignorenulls=True).over(w), 4).alias("first_purchase"),
            F.row_number().over(wf).alias("rn"),
        )
        .orderBy("user_id", "rn")
        .limit(500)
    )


_Q93_ORACLE = """
SELECT event_id, user_id,
       round(last_value(pv IGNORE NULLS) OVER w, 4) AS last_purchase,
       round(first_value(pv IGNORE NULLS) OVER w, 4) AS first_purchase,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
FROM (
  SELECT event_id, user_id, ts,
         CASE WHEN event_type = 'purchase' THEN value END AS pv
  FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY user_id, rn LIMIT 500
"""


# ------------------------------------------------- discrete quantile

def _q94_percentile_disc(spark: SparkSession, sf: str) -> DataFrame:
    """quantileExact (discrete): the smallest value whose cumulative
    rank reaches p — pure rank arithmetic, so both engines agree
    without any interpolation convention.  One partition-local sort
    per group (q38_median's shape)."""
    o = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    ranked = o.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("o_orderstatus")).alias("n"),
    )
    out = []
    for p_name, p in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        out.append(
            F.min(
                F.when(F.col("rn") >= F.ceil(F.lit(p) * F.col("n")), F.col("o_totalprice"))
            ).alias(p_name)
        )
    return ranked.groupBy("o_orderstatus").agg(*out).orderBy("o_orderstatus")


_Q94_ORACLE = """
SELECT o_orderstatus,
       min(CASE WHEN rn >= ceil(0.5 * n) THEN o_totalprice END) AS p50,
       min(CASE WHEN rn >= ceil(0.9 * n) THEN o_totalprice END) AS p90,
       min(CASE WHEN rn >= ceil(0.99 * n) THEN o_totalprice END) AS p99
FROM (
  SELECT o_orderstatus, o_totalprice,
         row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice) AS rn,
         count(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM orders)
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# ------------------------------------------ multiSearchAllPositions

def _q95_multi_positions(spark: SparkSession, sf: str) -> DataFrame:
    """multiSearchAllPositions(p_name, ['red','blue','green']): the
    1-based first position of each needle (0 when absent), rendered
    as a CSV string (the driver's pandas canonicalizer cannot hash
    array columns) — a row-local projection that stays in codegen."""
    p = load_table(spark, sf, "part")
    positions = F.array(
        *[F.instr(F.col("p_name"), lit) for lit in ("red", "blue", "green")]
    )
    return (
        p.select("p_partkey", positions.alias("pos_arr"))
        .filter(F.exists("pos_arr", lambda x: x > 0))
        .select(
            "p_partkey",
            F.array_join(F.transform("pos_arr", lambda x: x.cast("string")), ",").alias(
                "positions"
            ),
        )
        .orderBy("p_partkey")
        .limit(300)
    )


_Q95_ORACLE = """
WITH t AS (
  SELECT p_partkey,
         [coalesce(position('red' IN p_name), 0),
          coalesce(position('blue' IN p_name), 0),
          coalesce(position('green' IN p_name), 0)] AS pos_arr
  FROM part)
SELECT p_partkey,
       list_aggregate(list_transform(pos_arr, x -> CAST(x AS VARCHAR)),
                      'string_agg', ',') AS positions
FROM t
WHERE len(list_filter(pos_arr, x -> x > 0)) > 0
ORDER BY p_partkey LIMIT 300
"""


SPECS = [
    QuerySpec(
        "q92_array_join_outer",
        "LEFT ARRAY JOIN row preservation via posexplode_outer",
        _q92_array_join_outer,
        _Q92_ORACLE,
    ),
    QuerySpec(
        "q93_ignore_nulls",
        "first/last IGNORE NULLS gap-fill along user history",
        _q93_ignore_nulls,
        _Q93_ORACLE,
    ),
    QuerySpec(
        "q94_percentile_disc",
        "Discrete quantile by rank arithmetic (convention-free)",
        _q94_percentile_disc,
        _Q94_ORACLE,
    ),
    QuerySpec(
        "q95_multi_positions",
        "multiSearchAllPositions needle-position arrays",
        _q95_multi_positions,
        _Q95_ORACLE,
    ),
]


def _q97_date_bin(spark: SparkSession, sf: str) -> DataFrame:
    """toStartOfInterval / date_bin: 15-minute event buckets via the
    window() TVF (epoch-aligned, same convention as DuckDB's floored
    epoch arithmetic) feeding one hash aggregate."""
    e = load_table(spark, sf, "events")
    return (
        e.groupBy(
            F.window("ts", "15 minutes").getField("start").alias("bucket"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sv"))
        .orderBy("bucket", "event_type")
        .limit(600)
    )


_Q97_ORACLE = """
SELECT to_timestamp((floor(epoch(ts) / 900) * 900)::BIGINT)::TIMESTAMP AS bucket,
       event_type, count(*) AS n, round(sum(value), 2) AS sv
FROM events
GROUP BY bucket, event_type
ORDER BY bucket, event_type LIMIT 600
"""


SPECS.append(
    QuerySpec(
        "q97_date_bin",
        "toStartOfInterval/date_bin 15-minute buckets via window() TVF",
        _q97_date_bin,
        _Q97_ORACLE,
    )
)


def _q101_top_with_ties(spark: SparkSession, sf: str) -> DataFrame:
    """LIMIT n WITH TIES (ClickHouse supports it; Spark has no native
    form): the rank()-rewrite — every row tying the nth value
    survives.  rank() over one global ordering here; per-group ties
    use the same shape partitioned (q12's top-k-per-key)."""
    o = load_table(spark, sf, "orders")
    # coarsen to whole dollars so ties actually exist in the fixture
    w = Window.orderBy(F.desc(F.floor("o_totalprice")))
    return (
        o.withColumn("price_floor", F.floor("o_totalprice"))
        .withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 10)
        .select("o_orderkey", "price_floor", "rk")
        .orderBy("rk", "o_orderkey")
    )


_Q101_ORACLE = """
SELECT o_orderkey, price_floor, rk
FROM (
  SELECT o_orderkey, CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
         rank() OVER (ORDER BY floor(o_totalprice) DESC) AS rk
  FROM orders)
WHERE rk <= 10
ORDER BY rk, o_orderkey
"""


def _q102_pagination(spark: SparkSession, sf: str) -> DataFrame:
    """OFFSET/FETCH pagination (page 3, 20 rows/page) over a total
    order.  Spark's ``offset`` pushes into the same
    TakeOrderedAndProject as the limit — the driver materializes
    offset+limit rows, never the full sort."""
    o = load_table(spark, sf, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(40)
        .limit(20)
    )


_Q102_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 40
"""


def _q103_bag_setops(spark: SparkSession, sf: str) -> DataFrame:
    """EXCEPT ALL / INTERSECT ALL — bag (multiplicity-preserving)
    set operations, a different operator from q15's DISTINCT set ops:
    Catalyst plans them as multiplicity-tracking aggregates, not
    dedup + join."""
    c = load_table(spark, sf, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf, "supplier").select(F.col("s_nationkey").alias("k"))
    both = c.intersectAll(s).groupBy("k").agg(F.count(F.lit(1)).alias("n_inter"))
    only_c = c.exceptAll(s).groupBy("k").agg(F.count(F.lit(1)).alias("n_except"))
    return (
        both.join(only_c, "k", "full_outer")
        .select(
            "k",
            F.coalesce("n_inter", F.lit(0)).alias("n_inter"),
            F.coalesce("n_except", F.lit(0)).alias("n_except"),
        )
        .orderBy("k")
    )


_Q103_ORACLE = """
WITH inter AS (
  SELECT k, count(*) AS n_inter FROM (
    SELECT c_nationkey AS k FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier) GROUP BY k),
exc AS (
  SELECT k, count(*) AS n_except FROM (
    SELECT c_nationkey AS k FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier) GROUP BY k)
SELECT coalesce(inter.k, exc.k) AS k,
       coalesce(n_inter, 0) AS n_inter,
       coalesce(n_except, 0) AS n_except
FROM inter FULL OUTER JOIN exc ON inter.k = exc.k
ORDER BY k
"""


SPECS.extend(
    [
        QuerySpec(
            "q101_top_with_ties",
            "LIMIT n WITH TIES via the rank() rewrite",
            _q101_top_with_ties,
            _Q101_ORACLE,
        ),
        QuerySpec(
            "q102_pagination",
            "OFFSET/FETCH pagination inside TakeOrderedAndProject",
            _q102_pagination,
            _Q102_ORACLE,
        ),
        QuerySpec(
            "q103_bag_setops",
            "EXCEPT ALL / INTERSECT ALL multiplicity-preserving set ops",
            _q103_bag_setops,
            _Q103_ORACLE,
        ),
    ]
)


def lttb(
    df: DataFrame,
    series: list[str],
    x: str,
    y: str,
    n: int,
    order: list[str] | None = None,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (ClickHouse
    ``largestTriangleThreeBuckets(n)(x, y)``): per series, keep the
    first and last points and one point per index bucket — the one
    subtending the largest triangle against its neighbor buckets.

    Documented deviation (MIGRATION.md): ClickHouse anchors each
    bucket's triangle on the PREVIOUSLY SELECTED point, a sequential
    dependence; this implementation anchors on the previous bucket's
    AVERAGE (the standard parallel LTTB variant), so every bucket
    selects independently — one window pass + one bucket aggregate,
    fully parallel per series, no sequential scan.  Selection ties
    break on the earliest point.  Bucket averages are rounded (4dp)
    before the area arithmetic so the argmax is stable across
    summation orders.

    Scale: the bucket-stats side is |series| x n rows (broadcast); the
    data side is one window pass (partitioned by series) plus one
    aggregate keyed (series, bucket).  Output is |series| x n.
    """
    order = order or [x]
    w = Window.partitionBy(*series).orderBy(*order)
    wc = Window.partitionBy(*series)
    pts = df.select(
        *series,
        F.col(x).alias("__x"),
        F.col(y).alias("__y"),
        F.row_number().over(w).alias("__pos"),
        F.count(F.lit(1)).over(wc).alias("__cnt"),
    )
    small = pts.filter(F.col("__cnt") <= n)
    big = pts.filter(F.col("__cnt") > n)
    middle = big.filter((F.col("__pos") > 1) & (F.col("__pos") < F.col("__cnt"))).withColumn(
        "__bucket",
        F.floor((F.col("__pos") - 2) * (n - 2) / (F.col("__cnt") - 2)),
    )
    ends = big.groupBy(*series).agg(
        F.min_by(F.struct("__x", "__y"), "__pos").alias("__first"),
        F.max_by(F.struct("__x", "__y"), "__pos").alias("__last"),
    )
    wb = Window.partitionBy(*series).orderBy("__bucket")
    bstats = (
        middle.groupBy(*series, "__bucket")
        .agg(
            F.round(F.avg("__x"), 4).alias("__ax"),
            F.round(F.avg("__y"), 4).alias("__ay"),
        )
        .join(ends, series)
        .select(
            *series,
            "__bucket",
            F.coalesce(F.lag("__ax").over(wb), F.col("__first.__x")).alias("__px"),
            F.coalesce(F.lag("__ay").over(wb), F.col("__first.__y")).alias("__py"),
            F.coalesce(F.lead("__ax").over(wb), F.col("__last.__x")).alias("__nx"),
            F.coalesce(F.lead("__ay").over(wb), F.col("__last.__y")).alias("__ny"),
        )
    )
    area = F.round(
        F.abs(
            (F.col("__px") - F.col("__nx")) * (F.col("__y") - F.col("__py"))
            - (F.col("__px") - F.col("__x")) * (F.col("__ny") - F.col("__py"))
        ),
        6,
    )
    picked = (
        middle.join(F.broadcast(bstats), [*series, "__bucket"])
        .withColumn("__area", area)
        .groupBy(*series, "__bucket")
        .agg(
            F.max_by(
                F.struct("__x", "__y", "__pos"),
                F.struct(F.col("__area"), (-F.col("__pos")).alias("__tb")),
            ).alias("__p")
        )
        .select(*series, "__p.__x", "__p.__y", "__p.__pos")
    )
    endpoints = big.filter((F.col("__pos") == 1) | (F.col("__pos") == F.col("__cnt"))).select(
        *series, "__x", "__y", "__pos"
    )
    out = (
        small.select(*series, "__x", "__y", "__pos")
        .unionByName(endpoints)
        .unionByName(picked)
        .orderBy(*series, "__pos")
        .select(*series, F.col("__x").alias(x), F.col("__y").alias(y))
    )
    return out


def _q145_lttb(spark: SparkSession, sf: str) -> DataFrame:
    """``largestTriangleThreeBuckets(20)(toUnixTimestamp(ts), value)``
    per event_type: downsample each type's full series to 20 visually
    representative points (ClickHouse's dashboard-rendering aggregate,
    docs/en/sql-reference/aggregate-functions/reference/largestTriangleThreeBuckets).
    See :func:`lttb` for the parallel-anchor deviation note."""
    ev = load_table(spark, sf, "events").select(
        F.col("event_type").alias("g"),
        F.unix_timestamp("ts").alias("x"),
        F.col("value").alias("y"),
        "event_id",
    )
    return lttb(ev, ["g"], "x", "y", 20, order=["x", "event_id"]).select("g", "x", "y")


_Q145_ORACLE = """
WITH pts AS (
  SELECT event_type AS g, CAST(floor(epoch(ts)) AS BIGINT) AS x, value AS y,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS pos,
         count(*) OVER (PARTITION BY event_type) AS cnt
  FROM events),
middle AS (
  SELECT *, CAST(floor((pos - 2) * 18.0 / (cnt - 2)) AS BIGINT) AS bucket
  FROM pts WHERE pos > 1 AND pos < cnt AND cnt > 20),
ends AS (
  SELECT g, arg_min(x, pos) AS fx, arg_min(y, pos) AS fy,
         arg_max(x, pos) AS lx, arg_max(y, pos) AS ly
  FROM pts WHERE cnt > 20 GROUP BY g),
bstats AS (
  SELECT g, bucket, round(avg(x), 4) AS ax, round(avg(y), 4) AS ay
  FROM middle GROUP BY g, bucket),
anchors AS (
  SELECT bstats.g AS g, bucket,
         coalesce(lag(ax)  OVER w, fx) AS px,
         coalesce(lag(ay)  OVER w, fy) AS py,
         coalesce(lead(ax) OVER w, lx) AS nx,
         coalesce(lead(ay) OVER w, ly) AS ny
  FROM bstats JOIN ends ON bstats.g = ends.g
  WINDOW w AS (PARTITION BY bstats.g ORDER BY bucket)),
scored AS (
  SELECT middle.g AS g, middle.bucket AS bucket, x, y, pos,
         round(abs((px - nx) * (y - py) - (px - x) * (ny - py)), 6) AS area
  FROM middle JOIN anchors ON middle.g = anchors.g AND middle.bucket = anchors.bucket),
picked AS (
  SELECT g, x, y FROM (
    SELECT g, x, y,
           row_number() OVER (PARTITION BY g, bucket
                              ORDER BY area DESC, pos) AS rn
    FROM scored) t WHERE rn = 1),
endpoints AS (
  SELECT g, x, y FROM pts WHERE cnt > 20 AND (pos = 1 OR pos = cnt)),
small AS (SELECT g, x, y FROM pts WHERE cnt <= 20)
SELECT g, x, y FROM picked
UNION ALL SELECT g, x, y FROM endpoints
UNION ALL SELECT g, x, y FROM small
ORDER BY g, x
"""


SPECS.append(
    QuerySpec(
        "q145_lttb",
        "largestTriangleThreeBuckets: parallel LTTB downsampling",
        _q145_lttb,
        _Q145_ORACLE,
    )
)


def _q173_scd2_join(spark: SparkSession, sf: str) -> DataFrame:
    """SCD2 temporal-dimension join: match every event to the version
    of its user's dimension row whose validity interval contains the
    event timestamp — the slowly-changing-dimension shape every
    warehouse pipeline runs (the reference's users keep versioned
    dimensions in ReplacingMergeTree and join FINAL snapshots;
    README.md:29-52).

    The dimension is synthesized DETERMINISTICALLY on both engines:
    per user, 3 versions splitting [min(ts), max(ts)] into equal
    integer-second thirds (bounds from ONE 1-row broadcast aggregate,
    never a collect), status = 'tier_' || (user_id + version) % 4.

    Scale design: the join is equi on user_id with the interval as a
    residual range filter — a BroadcastHashJoin here (the dimension is
    users x 3 rows), a co-partitioned shuffle hash join at 100 TB;
    never a BNLJ because the equi key exists.  Every event matches
    exactly one version, so the join neither drops nor duplicates.
    Output is the fixed 4-row tier rollup; all aggregated columns are
    integers (exact under any summation order)."""
    e = load_table(spark, sf, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("e_s")
    )
    bounds = e.agg(
        F.min("e_s").alias("__mn"),
        F.max("e_s").alias("__mx"),
        F.min("user_id").alias("__mu"),
        F.max("user_id").alias("__xu"),
    )
    dim = (
        bounds.select(
            "__mn",
            "__mx",
            F.explode(F.expr("sequence(__mu, __xu)")).alias("d_user"),
        )
        .select(
            "__mn",
            "__mx",
            "d_user",
            F.explode(F.expr("sequence(0, 2)")).alias("version"),
        )
        .selectExpr(
            "d_user",
            "version",
            "__mn + version * (__mx - __mn + 1) div 3 AS valid_from",
            "__mn + (version + 1) * (__mx - __mn + 1) div 3 AS valid_to",
            "concat('tier_', CAST((d_user + version) % 4 AS STRING)) AS status",
        )
    )
    return (
        e.join(
            F.broadcast(dim),
            (e.user_id == dim.d_user)
            & (e.e_s >= dim.valid_from)
            & (e.e_s < dim.valid_to),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").alias("sum_eid"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("status")
    )


_Q173_ORACLE = """
WITH b AS (
  SELECT CAST(epoch(min(ts)) AS BIGINT) AS mn,
         CAST(epoch(max(ts)) AS BIGINT) AS mx,
         min(user_id) AS mu, max(user_id) AS xu
  FROM events),
dim AS (
  SELECT u.u AS d_user, v.v AS version,
         mn + v.v * (mx - mn + 1) // 3 AS valid_from,
         mn + (v.v + 1) * (mx - mn + 1) // 3 AS valid_to,
         'tier_' || CAST((u.u + v.v) % 4 AS VARCHAR) AS status
  FROM b,
       (SELECT unnest(generate_series(mu, xu)) AS u FROM b) u,
       (SELECT unnest([0, 1, 2]) AS v) v)
SELECT status,
       count(*) AS n,
       CAST(sum(event_id) AS BIGINT) AS sum_eid,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events e
JOIN dim d ON e.user_id = d.d_user
          AND CAST(epoch(e.ts) AS BIGINT) >= d.valid_from
          AND CAST(epoch(e.ts) AS BIGINT) < d.valid_to
GROUP BY status
ORDER BY status
"""


SPECS.append(
    QuerySpec(
        "q173_scd2_join",
        "SCD2 versioned-dimension temporal join: equi key + interval "
        "residual, broadcast dimension, exact integer rollup",
        _q173_scd2_join,
        _Q173_ORACLE,
    )
)
