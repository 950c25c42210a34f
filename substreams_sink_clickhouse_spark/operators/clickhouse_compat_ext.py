"""ClickHouse function-family parity, second batch (q77–q84).

Continues ``clickhouse_compat.py`` (the reference's analytics surface
IS ClickHouse SQL — /root/reference/README.md:29-52); each query
re-expresses one more signature ClickHouse family as a Catalyst plan
with a DuckDB oracle:

* ``q77_string_split``    — ``splitByChar`` / ``arrayStringConcat`` /
  ``countSubstrings`` / ``positionCaseInsensitive``.
* ``q78_json_extract``    — the ``JSONExtract*`` typed family
  (``JSONExtractInt``, ``JSONHas``, ``JSONExtractKeys``).
* ``q79_hash_encode``     — ``MD5`` / ``SHA256`` / ``hex`` /
  ``base64Encode`` digest-and-encode family.
* ``q80_running_accumulate`` — ``runningAccumulate`` (cumulative
  sum/min/max) + ``neighbor(col, -2, default)``.
* ``q81_exp_decay``       — ``exponentialTimeDecayedSum``-style decayed
  rolling sum over a bounded row frame.
* ``q82_rank_corr``       — ``rankCorr``: Spearman rank correlation as
  rank windows + Pearson ``corr``.
* ``q83_topk_weighted``   — ``topKWeighted``: heavy hitters ranked by a
  weight sum, not a row count.
* ``q84_geo_distance``    — ``greatCircleDistance`` (haversine) over
  coordinate pairs.

Scale notes: q77–q79 are pure row-level Catalyst expressions inside
whole-stage codegen (zero shuffles beyond the final sort); q80/q81 sort
within user partitions only; q82 computes ranks with per-group windows
then one algebraic ``corr`` aggregate; q83 pre-aggregates weights per
(user, type) — cardinality-bounded — before the rank; q84 is a
map-only trig expression on a broadcast-joined probe row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from substreams_sink_clickhouse_spark.operators.spec import QuerySpec
from substreams_sink_clickhouse_spark.sources.tables import load_table


# ---------------------------------------------------------- string family

def _q77_string_split(spark: SparkSession, sf: str) -> DataFrame:
    """splitByChar / arrayStringConcat / countSubstrings /
    positionCaseInsensitive — all as codegen'd JVM expressions."""
    p = load_table(spark, sf, "part")
    words = F.split(F.col("p_name"), " ")
    return (
        p.select(
            "p_partkey",
            F.array_join(F.reverse(words), "-").alias("rejoined"),
            F.size(words).alias("n_words"),
            (F.size(F.split(F.col("p_name"), "e", -1)) - 1).alias("n_e"),
            F.instr(F.lower(F.col("p_name")), "RED".lower()).alias("pos_red"),
        )
        .orderBy("p_partkey")
        .limit(200)
    )


_Q77_ORACLE = """
SELECT p_partkey,
       array_to_string(list_reverse(string_split(p_name, ' ')), '-') AS rejoined,
       len(string_split(p_name, ' ')) AS n_words,
       len(string_split(p_name, 'e')) - 1 AS n_e,
       CASE WHEN position(lower('RED') IN lower(p_name)) IS NULL THEN 0
            ELSE position(lower('RED') IN lower(p_name)) END AS pos_red
FROM part ORDER BY p_partkey LIMIT 200
"""


# ------------------------------------------------------------ JSON family

def _q78_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """JSONExtractInt / JSONHas / JSONExtractKeys over the events
    ``props`` JSON column; aggregated so the typed extraction feeds a
    numeric aggregate (the ClickHouse idiom)."""
    e = load_table(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        e.select(
            "event_type",
            k.alias("k"),
            F.when(k.isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("has_k"),
            F.json_object_keys(F.col("props")).alias("keys"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.sum("has_k").alias("n_with_k"),
            F.max(F.size(F.col("keys"))).alias("max_keys"),
        )
        .orderBy("event_type")
    )


_Q78_ORACLE = """
SELECT event_type,
       CAST(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
       CAST(sum(CASE WHEN json_extract(props, '$.k') IS NOT NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k,
       max(len(json_keys(props))) AS max_keys
FROM events GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------- hash / encode family

def _q79_hash_encode(spark: SparkSession, sf: str) -> DataFrame:
    """MD5 / SHA256 / hex / base64 — deterministic digests used for
    content addressing in CDC tables (the reference keys cursors by a
    module *hash*, /root/reference/db/cursor.go:48-101)."""
    d = load_table(spark, sf, "documents")
    t16 = F.substring(F.col("text"), 1, 16)
    return (
        d.select(
            "doc_id",
            F.md5(F.col("text")).alias("md5_hex"),
            F.substring(F.sha2(F.col("text"), 256), 1, 16).alias("sha256_16"),
            F.base64(t16.cast("binary")).alias("b64_prefix"),
            F.lower(F.hex(t16.cast("binary"))).alias("hex_prefix"),
        )
        .orderBy("doc_id")
        .limit(300)
    )


_Q79_ORACLE = """
SELECT doc_id,
       md5(text) AS md5_hex,
       substring(sha256(text), 1, 16) AS sha256_16,
       to_base64(substring(text, 1, 16)::BLOB) AS b64_prefix,
       lower(hex(substring(text, 1, 16)::BLOB)) AS hex_prefix
FROM documents ORDER BY doc_id LIMIT 300
"""


# ------------------------------------------- runningAccumulate / neighbor

def _q80_running_accumulate(spark: SparkSession, sf: str) -> DataFrame:
    """runningAccumulate(sumState(...)) and neighbor(value, -2, 0.0):
    per-user cumulative aggregates — sorts only inside user partitions
    (ClickHouse's equivalents assume block order; the window form is
    the distributed-correct statement of the same thing)."""
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        e.select(
            "event_id",
            "user_id",
            F.round(F.sum("value").over(cum), 4).alias("run_sum"),
            F.round(F.min("value").over(cum), 4).alias("run_min"),
            F.round(F.max("value").over(cum), 4).alias("run_max"),
            F.round(F.lag("value", 2, 0.0).over(w), 4).alias("neighbor2"),
        )
        .orderBy("user_id", "event_id")
        .limit(500)
    )


_Q80_ORACLE = """
SELECT event_id, user_id,
       round(sum(value) OVER w, 4) AS run_sum,
       round(min(value) OVER w, 4) AS run_min,
       round(max(value) OVER w, 4) AS run_max,
       round(coalesce(lag(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0.0), 4) AS neighbor2
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id LIMIT 500
"""


# ------------------------------------------------- exponential time decay

def _q81_exp_decay(spark: SparkSession, sf: str) -> DataFrame:
    """exponentialTimeDecayedSum-style rolling sum: each of the last 6
    rows weighted by exp(-distance/2).  Bounded frame → bounded state;
    the decayed fold is a higher-order ``aggregate`` over the frame's
    collected values (deterministic: frame order is the sort order)."""
    e = load_table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-5, Window.currentRow)
    )
    vals = F.collect_list(F.round(F.col("value"), 4)).over(w)
    # weight positionally (newest row gets k=1) via zip_with over a
    # descending index sequence — position-based, so duplicate values
    # in the frame can't mis-weight
    decayed = F.expr(
        "round(aggregate(zip_with(_frame, sequence(size(_frame), 1),"
        " (v, k) -> v * exp(-cast(k - 1 as double) / 2.0)),"
        " cast(0.0 as double), (acc, x) -> acc + x), 4)"
    )
    return (
        e.withColumn("_frame", vals)
        .select("event_id", "user_id", decayed.alias("decayed_sum"))
        .orderBy("user_id", "event_id")
        .limit(500)
    )


_Q81_ORACLE = """
SELECT event_id, user_id,
       round(list_sum(list_transform(
         list_zip(frame, range(len(frame), 0, -1)),
         p -> p[1] * exp(-(p[2] - 1)::DOUBLE / 2.0))), 4) AS decayed_sum
FROM (
  SELECT event_id, user_id,
         list(round(value, 4)) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS frame
  FROM events)
ORDER BY user_id, event_id LIMIT 500
"""


# ------------------------------------------------------------- rankCorr

def _q82_rank_corr(spark: SparkSession, sf: str) -> DataFrame:
    """rankCorr(value, k): Spearman correlation per event_type = ranks
    via per-group windows, then one algebraic Pearson ``corr``."""
    e = load_table(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("double")
    base = e.select("event_type", F.col("value"), k.alias("k"))
    wv = Window.partitionBy("event_type").orderBy("value")
    wk = Window.partitionBy("event_type").orderBy("k")
    ranked = base.withColumn("rv", F.rank().over(wv).cast("double")).withColumn(
        "rk", F.rank().over(wk).cast("double")
    )
    return (
        ranked.groupBy("event_type")
        .agg(F.round(F.corr("rv", "rk"), 6).alias("rank_corr"))
        .orderBy("event_type")
    )


_Q82_ORACLE = """
SELECT event_type, round(corr(rv, rk), 6) AS rank_corr
FROM (
  SELECT event_type,
         rank() OVER (PARTITION BY event_type ORDER BY value)::DOUBLE AS rv,
         rank() OVER (PARTITION BY event_type ORDER BY json_extract(props, '$.k')::DOUBLE)::DOUBLE AS rk
  FROM events)
GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------- topKWeighted

def _q83_topk_weighted(spark: SparkSession, sf: str) -> DataFrame:
    """topKWeighted(3)(event_type, value): heavy hitters by weight sum
    per user bucket.  Weights pre-aggregate per (bucket, type) —
    cardinality-bounded — before the rank; raw rows never sort."""
    e = load_table(spark, sf, "events")
    bucketed = (
        e.withColumn("bucket", (F.col("user_id") % 10).cast("bigint"))
        .groupBy("bucket", "event_type")
        .agg(F.round(F.sum("value"), 2).alias("weight"))
    )
    w = Window.partitionBy("bucket").orderBy(F.desc("weight"), "event_type")
    return (
        bucketed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("bucket", "event_type", "weight", "rk")
        .orderBy("bucket", "rk")
    )


_Q83_ORACLE = """
SELECT bucket, event_type, weight, rk
FROM (
  SELECT bucket, event_type, weight,
         row_number() OVER (PARTITION BY bucket ORDER BY weight DESC, event_type) AS rk
  FROM (
    SELECT user_id % 10 AS bucket, event_type, round(sum(value), 2) AS weight
    FROM events GROUP BY user_id % 10, event_type))
WHERE rk <= 3
ORDER BY bucket, rk
"""


# ------------------------------------------------- greatCircleDistance

def _q84_geo_distance(spark: SparkSession, sf: str) -> DataFrame:
    """greatCircleDistance (haversine, sphere radius 6371 km) between
    each vector's pseudo-coordinates (dims 0/1 scaled to lat/lon) and a
    fixed probe point — a map-only trig expression."""
    v = load_table(spark, sf, "embeddings")
    lat = F.element_at("embedding", 1).cast("double") * 90.0
    lon = F.element_at("embedding", 2).cast("double") * 180.0
    plat, plon = F.lit(48.8566), F.lit(2.3522)
    dlat = F.radians(lat - plat)
    dlon = F.radians(lon - plon)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(plat)) * F.cos(F.radians(lat)) * F.pow(F.sin(dlon / 2), 2)
    )
    dist = 2.0 * 6371000.0 * F.asin(F.sqrt(a))
    return (
        v.select("vec_id", F.round(dist / 1000.0, 3).alias("dist_km"))
        .orderBy("vec_id")
        .limit(500)
    )


_Q84_ORACLE = """
SELECT vec_id,
       round(2.0 * 6371000.0 * asin(sqrt(
         pow(sin(radians(embedding[1]::DOUBLE * 90.0 - 48.8566) / 2), 2)
         + cos(radians(48.8566)) * cos(radians(embedding[1]::DOUBLE * 90.0))
           * pow(sin(radians(embedding[2]::DOUBLE * 180.0 - 2.3522) / 2), 2)
       )) / 1000.0, 3) AS dist_km
FROM embeddings ORDER BY vec_id LIMIT 500
"""


SPECS = [
    QuerySpec(
        "q77_string_split",
        "splitByChar/arrayStringConcat/countSubstrings/position family",
        _q77_string_split,
        _Q77_ORACLE,
    ),
    QuerySpec(
        "q78_json_extract",
        "JSONExtract typed family (Int/Has/Keys) over props JSON",
        _q78_json_extract,
        _Q78_ORACLE,
    ),
    QuerySpec(
        "q79_hash_encode",
        "MD5/SHA256/hex/base64 digest-and-encode family",
        _q79_hash_encode,
        _Q79_ORACLE,
    ),
    QuerySpec(
        "q80_running_accumulate",
        "runningAccumulate cumulative aggs + neighbor(-2, default)",
        _q80_running_accumulate,
        _Q80_ORACLE,
    ),
    QuerySpec(
        "q81_exp_decay",
        "exponentialTimeDecayedSum-style decayed rolling sum",
        _q81_exp_decay,
        _Q81_ORACLE,
    ),
    QuerySpec(
        "q82_rank_corr",
        "rankCorr: Spearman rank correlation per group",
        _q82_rank_corr,
        _Q82_ORACLE,
    ),
    QuerySpec(
        "q83_topk_weighted",
        "topKWeighted heavy hitters by weight sum",
        _q83_topk_weighted,
        _Q83_ORACLE,
    ),
    QuerySpec(
        "q84_geo_distance",
        "greatCircleDistance haversine over coordinate pairs",
        _q84_geo_distance,
        _Q84_ORACLE,
    ),
]
