"""ClickHouse function-family parity queries.

The reference's entire analytics surface IS ClickHouse SQL
(/root/reference/README.md:29-52 queries the sunk tables directly), so
users of the reference lean on ClickHouse's signature function
families beyond ANSI SQL.  Each query here re-expresses one such
family Spark-first, with a DuckDB oracle:

* ``q51_replacing_final``  — ReplacingMergeTree ``SELECT ... FINAL``
  semantics (latest row version per key) via ``max_by``/``arg_max``;
  exactly what a CDC sink's consumers run on upsert tables.
* ``q52_url_funcs``        — the URL function family (``domain``,
  ``path``, ``extractURLParameter``) via Spark's JVM ``parse_url``.
* ``q53_ip_bits``          — IPv4 numeric<->dotted-quad functions
  (``IPv4NumToString``) and the ``groupBitAnd/Or/Xor`` aggregates.
* ``q54_cond_aggs``        — the ``-If`` aggregate combinators
  (``countIf``, ``sumIf`` ...) as one single-pass conditional
  aggregation with ``FILTER`` clauses / ``count_if``.
* ``q55_sequence_match``   — ``sequenceMatch('(?1).*(?2).*(?3)')``
  event-pattern matching: per-user ordered event string + regex.
* ``q56_topk``             — ``topK(k)`` heavy hitters: rank over
  pre-compressed (group, value) counts, never over raw rows.
* ``q57_retention``        — the ``retention(cond1, ...)`` aggregate:
  per-user condition flags in one pass, chained AND, summed.
* ``q58_summap``           — ``sumMap`` / ``-Map`` combinators:
  map-valued aggregation state as explode → re-aggregate → rebuild.
* ``q60_window_funnel``    — ``windowFunnel(window)``-style funnel
  with a time-window constraint on chain completion, one shuffle.

Scale design: every aggregate here is algebraic (map-side partials,
one shuffle on the group key); the only collect-based state is
q55's per-user event string, which is bounded by events-per-user —
the same bound ClickHouse's sequenceMatch state carries per group.
q56 ranks (event_type, user_id) count pairs — cardinality is the
distinct-pair count, not the event count — and q60 reuses a single
hash partitioning by user for all three chained stage columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from substreams_sink_clickhouse_spark.operators.spec import QuerySpec
from substreams_sink_clickhouse_spark.sources.tables import load_table


# ------------------------------------------------- ReplacingMergeTree FINAL

def _q51_replacing_final(spark: SparkSession, sf: str) -> DataFrame:
    """``SELECT ... FINAL`` on a ReplacingMergeTree-shaped table: the
    events fixture read as row versions (key = user_id, version =
    event_id) collapsed to the latest version per key.

    ``max_by`` aggregation, not a row_number window: the window form
    sorts every partition; ``max_by`` folds map-side partials and
    shuffles one row per key — the difference between O(n log n) per
    partition and O(n) at 100 TB.  This is the query every consumer of
    a CDC upsert table runs (the reference's sink produces exactly
    such tables, /root/reference/db/ops.go:64-75).
    """
    e = load_table(spark, sf, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_versions"),
            F.max("event_id").alias("last_event_id"),
            F.expr("max_by(event_type, event_id)").alias("last_type"),
            F.round(F.expr("max_by(value, event_id)"), 2).alias("last_value"),
        )
        .orderBy("user_id")
    )


_Q51_ORACLE = """
SELECT user_id,
       count(*) AS n_versions,
       max(event_id) AS last_event_id,
       arg_max(event_type, event_id) AS last_type,
       round(arg_max(value, event_id), 2) AS last_value
FROM events GROUP BY user_id ORDER BY user_id
"""


# ----------------------------------------------------------- URL functions

#: Deterministic URL synthesized per event (the fixture carries no URL
#: column); both engines build the identical string, then each applies
#: its own URL-decomposition functions.
_URL_SPARK = (
    "concat('https://', event_type, '.example.com/api/v1/u/', "
    "CAST(user_id AS STRING), '?uid=', CAST(user_id AS STRING), "
    "'&plan=', get_json_object(props, '$.k'))"
)
_URL_DUCK = (
    "concat('https://', event_type, '.example.com/api/v1/u/', "
    "CAST(user_id AS VARCHAR), '?uid=', CAST(user_id AS VARCHAR), "
    "'&plan=', CAST(json_extract(props, '$.k') AS VARCHAR))"
)


def _q52_url_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """URL decomposition (ClickHouse ``domain``/``topLevelDomain``/
    ``path``/``extractURLParameter``) with Spark's built-in
    ``parse_url`` — JVM-side, codegen-friendly, no UDF."""
    e = load_table(spark, sf, "events")
    url = F.expr(_URL_SPARK)
    return (
        e.select(
            "event_id",
            url.alias("url"),
            F.parse_url(url, F.lit("HOST")).alias("host"),
            F.regexp_extract(F.parse_url(url, F.lit("HOST")), r"\.([a-z]+)$", 1).alias("tld"),
            F.parse_url(url, F.lit("PATH")).alias("path"),
            F.parse_url(url, F.lit("QUERY"), F.lit("uid")).alias("uid"),
            F.parse_url(url, F.lit("QUERY"), F.lit("plan")).alias("plan"),
        )
        .orderBy("event_id")
        .limit(200)
    )


_Q52_ORACLE = f"""
WITH u AS (SELECT event_id, {_URL_DUCK} AS url FROM events)
SELECT event_id, url,
       regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
       regexp_extract(regexp_extract(url, '^https?://([^/?#]+)', 1), '\\.([a-z]+)$', 1) AS tld,
       regexp_extract(url, '^https?://[^/?#]+(/[^?#]*)', 1) AS path,
       regexp_extract(url, '[?&]uid=([^&#]*)', 1) AS uid,
       regexp_extract(url, '[?&]plan=([^&#]*)', 1) AS plan
FROM u ORDER BY event_id LIMIT 200
"""


# ------------------------------------------------- IPv4 + bit aggregates

#: Deterministic synthetic IPv4 per user (Knuth multiplicative hash
#: into the 32-bit space); identical arithmetic on both engines.
_IP_SPARK = "pmod(user_id * 2654435761L + 104729L, 4294967296L)"
_IP_DUCK = "(user_id * 2654435761 + 104729) % 4294967296"


def _q53_ip_bits(spark: SparkSession, sf: str) -> DataFrame:
    """IPv4NumToString + groupBitAnd/Or/Xor parity: dotted-quad
    rendering is pure bit arithmetic (shiftright/&), the bit aggregates
    are Spark built-ins — all algebraic, all map-side combinable."""
    e = load_table(spark, sf, "events").withColumn("ip", F.expr(_IP_SPARK))
    ip_str = F.concat_ws(
        ".",
        F.expr("shiftright(ip, 24) & 255"),
        F.expr("shiftright(ip, 16) & 255"),
        F.expr("shiftright(ip, 8) & 255"),
        F.expr("ip & 255"),
    )
    return (
        e.withColumn("ip_str", ip_str)
        .groupBy("event_type")
        .agg(
            F.min("ip_str").alias("min_ip_str"),
            F.bit_and("ip").alias("ips_and"),
            F.bit_or("ip").alias("ips_or"),
            F.bit_xor("ip").alias("ips_xor"),
            F.countDistinct("ip").alias("n_ips"),
        )
        .orderBy("event_type")
    )


_Q53_ORACLE = f"""
WITH t AS (
  SELECT event_type, {_IP_DUCK} AS ip FROM events),
s AS (
  SELECT event_type, ip,
         concat_ws('.', (ip >> 24) & 255, (ip >> 16) & 255, (ip >> 8) & 255, ip & 255) AS ip_str
  FROM t)
SELECT event_type,
       min(ip_str) AS min_ip_str,
       bit_and(ip) AS ips_and,
       bit_or(ip) AS ips_or,
       bit_xor(ip) AS ips_xor,
       count(DISTINCT ip) AS n_ips
FROM s GROUP BY event_type ORDER BY event_type
"""


# ------------------------------------------------------ -If combinators

def _q54_cond_aggs(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse ``-If`` combinators (``countIf``/``sumIf``/``avgIf``/
    ``uniqExactIf``) as ONE single-pass conditional aggregation: every
    conditional aggregate shares the same scan and shuffle (the whole
    point of the combinator family — N filtered metrics without N
    queries)."""
    e = load_table(spark, sf, "events")
    return (
        e.groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(
            F.expr("count_if(value > 300)").alias("n_big"),
            F.round(
                F.expr("sum(value) FILTER (WHERE event_type = 'click')"), 2
            ).alias("click_sum"),
            F.round(
                F.expr("avg(value) FILTER (WHERE event_type = 'view')"), 4
            ).alias("view_avg"),
            F.expr("count(DISTINCT user_id) FILTER (WHERE event_type = 'error')").alias(
                "err_users"
            ),
        )
        .orderBy("d")
    )


_Q54_ORACLE = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
       count(*) FILTER (WHERE value > 300) AS n_big,
       round(sum(value) FILTER (WHERE event_type = 'click'), 2) AS click_sum,
       round(avg(value) FILTER (WHERE event_type = 'view'), 4) AS view_avg,
       count(DISTINCT user_id) FILTER (WHERE event_type = 'error') AS err_users
FROM events GROUP BY d ORDER BY d
"""


# ------------------------------------------------------- sequenceMatch

#: Event types map to distinct first letters (click/error/purchase/
#: signup/view -> c/e/p/s/v), so a user's ordered history is a compact
#: string and sequenceMatch patterns become plain regexes.
_VCP = "v.*c.*p"  # view, later click, later purchase
_SVCP = "s.*v.*c.*p"  # full signup -> view -> click -> purchase


def _q55_sequence_match(spark: SparkSession, sf: str) -> DataFrame:
    """``sequenceMatch('(?1).*(?2).*(?3)')`` parity: per-user event
    history ordered by (ts, event_id) folded to a character string,
    then regex-matched.  Per-group state is the user's own history —
    the same bound ClickHouse's sequence functions carry; the ordering
    happens inside each group's array (``array_sort``), never as a
    global sort."""
    e = load_table(spark, sf, "events")
    seqs = (
        e.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"), F.expr("substring(event_type, 1, 1)").alias("ch")
            ).alias("ev"),
        )
        .groupBy("user_id")
        .agg(
            F.expr("array_join(transform(array_sort(collect_list(ev)), x -> x.ch), '')").alias(
                "seq"
            )
        )
    )
    return seqs.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.expr(f"count_if(seq rlike '{_VCP}')").alias("n_vcp"),
        F.expr(f"count_if(seq rlike '{_SVCP}')").alias("n_svcp"),
    )


_Q55_ORACLE = f"""
WITH seqs AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id)
SELECT count(*) AS n_users,
       count(*) FILTER (WHERE regexp_matches(seq, '{_VCP}')) AS n_vcp,
       count(*) FILTER (WHERE regexp_matches(seq, '{_SVCP}')) AS n_svcp
FROM seqs
"""


# ------------------------------------------------------------- topK
def _q56_topk(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse ``topK(5)(user_id)`` per event type (heavy hitters).

    Spark-first shape: compress to (event_type, user_id) counts FIRST
    (algebraic, map-side combined), then rank the compressed pairs.
    The ranking window runs over distinct-pair cardinality, not raw
    events — at 100 TB the raw table never feeds a sort.  ClickHouse's
    topK is approximate (SpaceSaving); the deterministic exact top-k
    with a total tie-break is the oracle-checkable contract.
    """
    e = load_table(spark, sf, "events")
    counts = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy(F.desc("cnt"), F.asc("user_id"))
    ranked = counts.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)
    return (
        ranked.groupBy("event_type")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(rk, user_id))),"
                " x -> CAST(x.user_id AS STRING)), ',')"
            ).alias("top_users"),
            F.sum("cnt").alias("top_events"),
        )
        .orderBy("event_type")
    )


_Q56_ORACLE = """
WITH c AS (
  SELECT event_type, user_id, count(*) AS cnt FROM events GROUP BY event_type, user_id),
r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY cnt DESC, user_id) AS rk
  FROM c)
SELECT event_type,
       string_agg(CAST(user_id AS VARCHAR), ',' ORDER BY rk) AS top_users,
       CAST(sum(cnt) AS BIGINT) AS top_events
FROM r WHERE rk <= 5 GROUP BY event_type ORDER BY event_type
"""


# -------------------------------------------------------- retention
def _q57_retention(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse ``retention(cond1, cond2, cond3)``: per-user boolean
    per condition in ONE pass (max-of-case, algebraic), chained AND
    exactly as ClickHouse defines it (cond_n counts only if cond_1
    held), then summed across users.  Two aggregations, one shuffle on
    user_id; the second input is one row per user.
    """
    e = load_table(spark, sf, "events")
    d = F.to_date("ts")

    def hit(day: str):
        return F.max(F.when(d == F.lit(day).cast("date"), 1).otherwise(0))

    per_user = e.groupBy("user_id").agg(
        hit("2024-01-01").alias("c1"),
        hit("2024-01-02").alias("c2"),
        hit("2024-01-03").alias("c3"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("c1").alias("r1"),
        F.sum(F.col("c1") * F.col("c2")).alias("r2"),
        F.sum(F.col("c1") * F.col("c2") * F.col("c3")).alias("r3"),
    )


_Q57_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-01' THEN 1 ELSE 0 END) AS c1,
         max(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-02' THEN 1 ELSE 0 END) AS c2,
         max(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-03' THEN 1 ELSE 0 END) AS c3
  FROM events GROUP BY user_id)
SELECT count(*) AS n_users,
       CAST(sum(c1) AS BIGINT) AS r1,
       CAST(sum(c1 * c2) AS BIGINT) AS r2,
       CAST(sum(c1 * c2 * c3) AS BIGINT) AS r3
FROM per_user
"""


# ----------------------------------------------------------- sumMap
def _q58_summap(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse ``sumMap`` (the ``-Map`` combinator family): per day,
    a map event_type → sum(value), keys sorted.

    Spark-first mapping of map-valued aggregation state: aggregate the
    exploded (group, key) pairs — algebraic, map-side combinable —
    then rebuild the map column per group.  This is strictly more
    scalable than carrying map state through the shuffle: partial
    aggregation compresses on (day, event_type) before any map exists.
    Rendered as a deterministic ``k:v`` string so the oracle compares
    content, not engine-specific map encodings.
    """
    e = load_table(spark, sf, "events")
    per = e.groupBy(F.date_trunc("day", "ts").alias("d"), "event_type").agg(
        F.round(F.sum("value"), 2).alias("s")
    )
    return (
        per.groupBy("d")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(event_type, s))),"
                " x -> concat(x.event_type, ':', CAST(x.s AS STRING))), ';')"
            ).alias("sum_map")
        )
        .orderBy("d")
    )


_Q58_ORACLE = """
WITH per AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, event_type,
         round(sum(value), 2) AS s
  FROM events GROUP BY d, event_type)
SELECT d,
       string_agg(concat(event_type, ':', CAST(s AS VARCHAR)), ';' ORDER BY event_type) AS sum_map
FROM per GROUP BY d ORDER BY d
"""


# ----------------------------------------------------- windowFunnel
def _q60_window_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """``windowFunnel(86400)``-style time-constrained funnel: deepest
    stage of view → click → purchase whose chain (first view, first
    later click, first later purchase) completes within 24h of the
    chain start.

    One shuffle total: all three chained stage timestamps are window
    minima over the SAME ``partitionBy(user_id)`` hash partitioning
    (no orderBy → no per-partition sort), so Catalyst reuses one
    exchange for t1 → t2 → t3 → the final per-user collapse.  Contrast
    q42_funnel, which stages through broadcast joins; both shapes are
    valid at scale, this one never materializes per-stage tables.
    """
    e = load_table(spark, sf, "events").select("user_id", "ts", "event_type")
    w = Window.partitionBy("user_id")
    s = (
        e.withColumn(
            "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = s.groupBy("user_id").agg(
        F.first("t1").alias("t1"), F.first("t2").alias("t2"), F.first("t3").alias("t3")
    )
    day = F.expr("INTERVAL 24 HOURS")
    level = (
        F.when(F.col("t3") <= F.col("t1") + day, 3)
        .when(F.col("t2") <= F.col("t1") + day, 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        per_user.select(level.alias("level"))
        .groupBy("level")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("level")
    )


_Q60_ORACLE = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id),
t3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id),
lv AS (
  SELECT u.user_id,
         CASE WHEN t3.t3 <= t1.t1 + INTERVAL 24 HOUR THEN 3
              WHEN t2.t2 <= t1.t1 + INTERVAL 24 HOUR THEN 2
              WHEN t1.t1 IS NOT NULL THEN 1
              ELSE 0 END AS level
  FROM (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN t1 ON u.user_id = t1.user_id
  LEFT JOIN t2 ON u.user_id = t2.user_id
  LEFT JOIN t3 ON u.user_id = t3.user_id)
SELECT level, count(*) AS n_users FROM lv GROUP BY level ORDER BY level
"""


# ------------------------------------------------- array manipulation family

def _q61_array_manipulation(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse array-manipulation family (``arraySort`` /
    ``arraySlice`` / ``arrayDistinct`` / ``arrayStringConcat``) over
    tokenized documents.

    Everything is a Catalyst higher-order function on one row — no
    shuffle at all until the final presentation sort, so the operator
    is a pure narrow scan that scales linearly with the corpus.
    """
    d = load_table(spark, sf, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    head8 = F.slice(toks, 1, 8)
    return (
        d.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(head8)).alias("n_uniq8"),
            F.array_join(
                F.slice(F.array_sort(F.array_distinct(head8)), 1, 3), "|"
            ).alias("head3"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


_Q61_ORACLE = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_distinct(toks[1:8])) AS n_uniq8,
       array_to_string(list_sort(list_distinct(toks[1:8]))[1:3], '|') AS head3
FROM t ORDER BY doc_id LIMIT 200
"""


# ------------------------------------------------- uniq combinator family

def _q62_uniq_combinators(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse ``uniq`` combinator family — ``uniqExact``,
    ``uniqUpTo(N)`` (capped distinct count), ``uniqExactIf`` — in one
    single-pass aggregation per event_type.

    All three reduce to one hash aggregate over (event_type, user_id)
    partials; Catalyst plans the distinct expansion with map-side
    partial aggregation, so the shuffle carries distinct pairs, not
    raw events.
    """
    e = load_table(spark, sf, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("uniq_exact"),
            F.least(F.countDistinct("user_id"), F.lit(100)).alias("uniq_upto_100"),
            F.countDistinct(
                F.when(F.col("value") > 50.0, F.col("user_id"))
            ).alias("uniq_if_hi"),
        )
        .orderBy("event_type")
    )


_Q62_ORACLE = """
SELECT event_type,
       count(DISTINCT user_id) AS uniq_exact,
       least(count(DISTINCT user_id), 100) AS uniq_upto_100,
       count(DISTINCT CASE WHEN value > 50.0 THEN user_id END) AS uniq_if_hi
FROM events GROUP BY event_type ORDER BY event_type
"""


# ------------------------------------------------- quantileExactWeighted

def _q63_weighted_median(spark: SparkSession, sf: str) -> DataFrame:
    """``quantileExactWeighted(0.5)(price, weight)`` — exact weighted
    median of l_extendedprice weighted by l_quantity per return flag:
    the smallest price whose cumulative weight reaches half the total.

    One shuffle on l_returnflag feeds both window functions (the
    cumulative sum and the partition total reuse the same exchange +
    sort), then the qualifying rows collapse with an algebraic ``min``.
    Ties in price are safe: within a tied run the answer is the tied
    price regardless of intra-run row order.
    """
    li = load_table(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").alias("wt"),
    )
    w_cum = (
        Window.partitionBy("flag")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("flag")
    c = li.withColumn("cum", F.sum("wt").over(w_cum)).withColumn(
        "tot", F.sum("wt").over(w_tot)
    )
    return (
        c.filter(F.col("cum") >= F.col("tot") / 2)
        .groupBy("flag")
        .agg(F.round(F.min("price"), 2).alias("wmedian"))
        .orderBy("flag")
    )


_Q63_ORACLE = """
WITH w AS (
  SELECT l_returnflag AS flag, l_extendedprice AS price,
         sum(l_quantity) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tot
  FROM lineitem)
SELECT flag, round(min(price), 2) AS wmedian
FROM w WHERE cum >= tot / 2 GROUP BY flag ORDER BY flag
"""


# ------------------------------------------------- bitmap cohort algebra

def _q64_bitmap_ops(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse bitmap family (``groupBitmap``, ``bitmapAnd``,
    ``bitmapOr``, ``bitmapAndnot`` cardinalities) as cohort set algebra:
    users who clicked vs users who purchased.

    ClickHouse materializes roaring bitmaps; the Spark-first shape is
    one hash aggregate to per-user membership flags (the "bitmap"),
    then a global algebraic fold of the flag vectors — two map-side
    partial aggregations, one row out.  No joins, no distinct over the
    raw stream.
    """
    e = load_table(spark, sf, "events")
    flags = e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("a"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("b"),
    )
    return flags.select(
        F.sum("a").alias("card_click"),
        F.sum("b").alias("card_purchase"),
        F.sum(F.col("a") * F.col("b")).alias("card_and"),
        F.sum(F.least(F.col("a") + F.col("b"), F.lit(1))).alias("card_or"),
        F.sum(F.col("a") * (1 - F.col("b"))).alias("card_andnot"),
    )


_Q64_ORACLE = """
WITH u AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
  FROM events GROUP BY user_id)
SELECT CAST(sum(a) AS BIGINT) AS card_click,
       CAST(sum(b) AS BIGINT) AS card_purchase,
       CAST(sum(a * b) AS BIGINT) AS card_and,
       CAST(sum(least(a + b, 1)) AS BIGINT) AS card_or,
       CAST(sum(a * (1 - b)) AS BIGINT) AS card_andnot
FROM u
"""


# ------------------------------------------------- running difference

def _q65_running_difference(spark: SparkSession, sf: str) -> DataFrame:
    """``runningDifference`` / ``runningAccumulate`` parity: daily
    revenue series with day-over-day delta and running total.

    The window ordering runs over the *aggregated* daily series (rows
    = distinct days, a few hundred even at 100 TB of raw events), so
    the single-partition window after the groupBy is bounded by the
    calendar, not the data — the same state bound ClickHouse's
    runningDifference carries.
    """
    e = load_table(spark, sf, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value"), 2).alias("total")
    )
    w = Window.orderBy("day")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        daily.withColumn(
            "delta", F.round(F.col("total") - F.lag("total").over(w), 2)
        )
        .withColumn("running", F.round(F.sum("total").over(w_run), 2))
        .orderBy("day")
    )


_Q65_ORACLE = """
WITH d AS (
  SELECT cast(date_trunc('day', ts) AS DATE) AS day, round(sum(value), 2) AS total
  FROM events GROUP BY 1)
SELECT day, total,
       round(total - lag(total) OVER (ORDER BY day), 2) AS delta,
       round(sum(total) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW), 2) AS running
FROM d ORDER BY day
"""


# ------------------------------------------------- LIMIT BY

def _q66_limit_by(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse ``LIMIT n BY col`` — the top-2 highest-value events
    per user, with a deterministic tiebreak on event_id.

    ``row_number`` over a hash-partitioned window: one exchange on the
    group key, per-partition sort only.  At scale this beats a global
    sort because each group's candidates never leave their partition —
    exactly how ClickHouse streams LIMIT BY per block.
    """
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("user_id", "rn", "event_id", F.round("value", 2).alias("value"))
        .orderBy("user_id", "rn")
    )


_Q66_ORACLE = """
SELECT user_id, rn, event_id, round(value, 2) AS value
FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rn
  FROM events)
WHERE rn <= 2 ORDER BY user_id, rn
"""


# ------------------------------------------------- formatDateTime

def _q67_format_datetime(spark: SparkSession, sf: str) -> DataFrame:
    """``formatDateTime`` / ``toString(DateTime)`` parity: string
    formatting of timestamps (day string + zero-padded hour) as
    aggregation keys.  Pure JVM projection into a hash aggregate."""
    e = load_table(spark, sf, "events")
    return (
        e.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.date_format("ts", "HH").alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("day", "hour")
    )


_Q67_ORACLE = """
SELECT strftime(ts, '%Y-%m-%d') AS day, strftime(ts, '%H') AS hour,
       count(*) AS cnt
FROM events GROUP BY 1, 2 ORDER BY day, hour
"""


# ------------------------------------------------- groupUniqArray

def _q68_group_uniq_array(spark: SparkSession, sf: str) -> DataFrame:
    """``groupUniqArray`` — distinct-set aggregation per key, emitted
    as a sorted array for determinism.

    ``collect_set`` is an algebraic aggregate (map-side partial sets
    merge in the combiner), bounded here by the event-type cardinality
    — the state per key is the distinct set, not the row stream.
    """
    e = load_table(spark, sf, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types"),
            F.size(F.collect_set("event_type")).alias("n_types"),
        )
        .orderBy("user_id")
    )


_Q68_ORACLE = """
SELECT user_id,
       list_aggregate(list_sort(list(DISTINCT event_type)), 'string_agg', ',') AS types,
       len(list(DISTINCT event_type)) AS n_types
FROM events GROUP BY user_id ORDER BY user_id
"""


# ------------------------------------------------- multiSearch / position

def _q70_multi_search(spark: SparkSession, sf: str) -> DataFrame:
    """``multiSearchAny`` / ``position`` family: per language, how many
    documents contain any of a set of needles, and the average first
    position of a common marker.  Pure string projections into one
    hash aggregate — narrow scan, single shuffle on lang."""
    d = load_table(spark, sf, "documents")
    any_hit = (
        F.col("text").contains("data")
        | F.col("text").contains("model")
        | F.col("text").contains("neural")
    )
    pos = F.locate("the", F.col("text"))
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(any_hit.cast("int")).alias("n_any_hit"),
            F.round(F.avg(F.when(pos > 0, pos)), 2).alias("avg_marker_pos"),
        )
        .orderBy("lang")
    )


_Q70_ORACLE = """
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN contains(text, 'data') OR contains(text, 'model')
                  OR contains(text, 'neural') THEN 1 ELSE 0 END) AS BIGINT) AS n_any_hit,
       round(avg(CASE WHEN position('the' IN text) > 0
                      THEN position('the' IN text) END), 2) AS avg_marker_pos
FROM documents GROUP BY lang ORDER BY lang
"""


# ------------------------------------------------- arrayZip / tupleElement

def _q71_array_zip(spark: SparkSession, sf: str) -> DataFrame:
    """``arrayZip`` + ``tupleElement`` + ``arrayMax over tuples``: the
    argmax dimension of each embedding's first 8 components.  Zipping
    values with their indices and taking the struct max is the
    canonical argmax-without-explode — per-row higher-order ops, zero
    shuffle before the presentation sort."""
    e = load_table(spark, sf, "embeddings")
    head8 = F.expr(
        "slice(transform(embedding, x -> round(CAST(x AS DOUBLE), 6)), 1, 8)"
    )
    best = F.array_max(
        F.expr(
            "zip_with(emb8, sequence(1, size(emb8)), (v, i) -> struct(v AS v, i AS i))"
        )
    )
    return (
        e.select("vec_id", head8.alias("emb8"))
        .select(
            "vec_id",
            best["i"].alias("argmax_dim"),
            F.round(best["v"], 4).alias("max_val"),
        )
        .orderBy("vec_id")
        .limit(200)
    )


_Q71_ORACLE = """
WITH t AS (
  SELECT vec_id,
         list_transform(embedding[1:8], x -> round(CAST(x AS DOUBLE), 6)) AS emb8
  FROM embeddings),
m AS (
  SELECT vec_id,
         list_max(list_transform(list_zip(emb8, range(1, len(emb8) + 1)),
                                 p -> [p[1], CAST(p[2] AS DOUBLE)])) AS best
  FROM t)
SELECT vec_id,
       CAST(best[2] AS BIGINT) AS argmax_dim,
       round(best[1], 4) AS max_val
FROM m ORDER BY vec_id LIMIT 200
"""


# ------------------------------------------------- pad / trim / affix tests

def _q72_pad_trim(spark: SparkSession, sf: str) -> DataFrame:
    """``leftPad``/``rightPad``/``trimBoth``/``startsWith``/``endsWith``
    string family as aggregation keys and flags over part names."""
    p = load_table(spark, sf, "part")
    return (
        p.select(
            "p_partkey",
            F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
            F.trim(F.col("p_name")).alias("name"),
            F.col("p_name").startswith("b").alias("starts_b"),
            F.col("p_name").endswith("d").alias("ends_d"),
        )
        .orderBy("p_partkey")
        .limit(200)
    )


_Q72_ORACLE = """
SELECT p_partkey,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
       trim(p_name) AS name,
       starts_with(p_name, 'b') AS starts_b,
       suffix(p_name, 'd') AS ends_d
FROM part ORDER BY p_partkey LIMIT 200
"""


# ------------------------------------------------- avgWeighted / deltaSum

def _q73_weighted_aggs(spark: SparkSession, sf: str) -> DataFrame:
    """``avgWeighted(x, w)`` and ``deltaSum(x)`` (sum of positive
    deltas over the ordered series) per user.

    avgWeighted is algebraic (two sums).  deltaSum needs the ordered
    neighbor difference: one window pass over the SAME user_id
    partitioning the aggregate then reuses — a single exchange total,
    with per-user state bounded by one previous value, exactly the
    running state ClickHouse's deltaSum carries per group."""
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    d = e.withColumn("prev", F.lag("value").over(w))
    delta = F.when(
        F.col("prev").isNotNull() & (F.col("value") > F.col("prev")),
        F.col("value") - F.col("prev"),
    ).otherwise(0.0)
    return (
        d.groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("event_id"))
                / F.sum(F.col("event_id")),
                4,
            ).alias("avg_weighted"),
            F.round(F.sum(delta), 2).alias("delta_sum"),
        )
        .orderBy("user_id")
    )


_Q73_ORACLE = """
WITH d AS (
  SELECT user_id, event_id, value,
         lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
  FROM events)
SELECT user_id,
       round(sum(value * event_id) / sum(event_id), 4) AS avg_weighted,
       round(sum(CASE WHEN prev IS NOT NULL AND value > prev
                      THEN value - prev ELSE 0.0 END), 2) AS delta_sum
FROM d GROUP BY user_id ORDER BY user_id
"""


# ------------------------------------------------- arrayCumSum / arrayDifference

def _q74_array_cum(spark: SparkSession, sf: str) -> DataFrame:
    """``arrayCumSum`` / ``arrayDifference`` on the first 8 embedding
    components — per-row higher-order expressions, no shuffle.  The
    O(k^2) prefix-slice form keeps the arithmetic order identical in
    both engines (k is a constant 8)."""
    e = load_table(spark, sf, "embeddings")
    head8 = F.expr(
        "slice(transform(embedding, x -> round(CAST(x AS DOUBLE), 6)), 1, 8)"
    )
    # Driver-canonicalizable output: render the arrays as fixed-scale
    # decimal CSV strings (the pandas-based harness cannot sort/hash
    # raw array columns).  DECIMAL(18,6) string form is identical in
    # Spark and DuckDB, sidestepping double-formatting drift.
    cum = F.expr(
        "array_join(transform(sequence(1, size(emb8)), i -> "
        "CAST(CAST(round(aggregate(slice(emb8, 1, i), CAST(0.0 AS DOUBLE),"
        " (a, x) -> a + x), 6) AS DECIMAL(18, 6)) AS STRING)), ',')"
    )
    diff = F.expr(
        "array_join(transform(sequence(2, size(emb8)), i -> "
        "CAST(CAST(round(element_at(emb8, i) - element_at(emb8, i - 1), 6)"
        " AS DECIMAL(18, 6)) AS STRING)), ',')"
    )
    return (
        e.select("vec_id", head8.alias("emb8"))
        .select("vec_id", cum.alias("cumsum"), diff.alias("diffs"))
        .orderBy("vec_id")
        .limit(200)
    )


_Q74_ORACLE = """
WITH t AS (
  SELECT vec_id,
         list_transform(embedding[1:8], x -> round(CAST(x AS DOUBLE), 6)) AS emb8
  FROM embeddings)
SELECT vec_id,
       list_aggregate(list_transform(range(1, len(emb8) + 1),
                      i -> CAST(CAST(round(list_sum(emb8[1:i]), 6) AS DECIMAL(18,6)) AS VARCHAR)),
                      'string_agg', ',') AS cumsum,
       list_aggregate(list_transform(range(2, len(emb8) + 1),
                      i -> CAST(CAST(round(emb8[i] - emb8[i - 1], 6) AS DECIMAL(18,6)) AS VARCHAR)),
                      'string_agg', ',') AS diffs
FROM t ORDER BY vec_id LIMIT 200
"""


# ------------------------------------------------- entropy

def _q75_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse ``entropy()`` aggregate: Shannon entropy of each
    user's event-type distribution.  Two stacked algebraic aggregates
    — (user, type) counts, then the -sum(p log2 p) fold — both with
    map-side partials; no window, no collect."""
    e = load_table(spark, sf, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    per_user = counts.groupBy("user_id").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.log2("c")).alias("clog"),
    )
    return (
        per_user.select(
            "user_id",
            F.round(F.log2("n") - F.col("clog") / F.col("n"), 6).alias("entropy"),
        )
        .orderBy("user_id")
    )


_Q75_ORACLE = """
WITH counts AS (
  SELECT user_id, event_type, count(*) AS c
  FROM events GROUP BY user_id, event_type),
per_user AS (
  SELECT user_id, sum(c) AS n, sum(c * log2(c)) AS clog
  FROM counts GROUP BY user_id)
SELECT user_id, round(log2(n) - clog / n, 6) AS entropy
FROM per_user ORDER BY user_id
"""


# ------------------------------------------------- simpleLinearRegression

def _q76_linreg(spark: SparkSession, sf: str) -> DataFrame:
    """``simpleLinearRegression(x, y)``: least-squares slope/intercept
    of l_extendedprice on l_quantity per return flag, computed from the
    four algebraic sums (one pass, map-side partials) rather than a
    second centered pass."""
    li = load_table(spark, sf, "lineitem")
    agg = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("sx"),
        F.sum("l_extendedprice").alias("sy"),
        F.sum(F.col("l_quantity") * F.col("l_extendedprice")).alias("sxy"),
        F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return agg.select(
        "flag",
        F.round(slope, 4).alias("slope"),
        F.round(intercept, 2).alias("intercept"),
    ).orderBy("flag")


_Q76_ORACLE = """
WITH agg AS (
  SELECT l_returnflag AS flag, count(*) AS n,
         sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
         sum(l_quantity * l_extendedprice) AS sxy,
         sum(l_quantity * l_quantity) AS sxx
  FROM lineitem GROUP BY l_returnflag)
SELECT flag,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 2) AS intercept
FROM agg ORDER BY flag
"""


SPECS: list[QuerySpec] = [
    QuerySpec(
        "q51_replacing_final",
        "ReplacingMergeTree SELECT...FINAL (latest version per key)",
        _q51_replacing_final,
        _Q51_ORACLE,
    ),
    QuerySpec(
        "q52_url_funcs",
        "URL function family via parse_url (domain/path/param)",
        _q52_url_funcs,
        _Q52_ORACLE,
    ),
    QuerySpec(
        "q53_ip_bits",
        "IPv4 dotted-quad + groupBitAnd/Or/Xor aggregates",
        _q53_ip_bits,
        _Q53_ORACLE,
    ),
    QuerySpec(
        "q54_cond_aggs",
        "-If aggregate combinators as single-pass FILTER aggregation",
        _q54_cond_aggs,
        _Q54_ORACLE,
    ),
    QuerySpec(
        "q55_sequence_match",
        "sequenceMatch event-pattern matching over ordered history",
        _q55_sequence_match,
        _Q55_ORACLE,
    ),
    QuerySpec(
        "q56_topk",
        "topK heavy hitters over compressed counts",
        _q56_topk,
        _Q56_ORACLE,
    ),
    QuerySpec(
        "q57_retention",
        "retention() chained-condition aggregate",
        _q57_retention,
        _Q57_ORACLE,
    ),
    QuerySpec(
        "q58_summap",
        "sumMap / -Map combinator (map-valued aggregation)",
        _q58_summap,
        _Q58_ORACLE,
    ),
    QuerySpec(
        "q60_window_funnel",
        "windowFunnel-style time-constrained funnel (one shuffle)",
        _q60_window_funnel,
        _Q60_ORACLE,
    ),
    QuerySpec(
        "q61_array_manipulation",
        "arraySort/arraySlice/arrayDistinct/arrayStringConcat family",
        _q61_array_manipulation,
        _Q61_ORACLE,
    ),
    QuerySpec(
        "q62_uniq_combinators",
        "uniqExact / uniqUpTo(N) / uniqExactIf in one pass",
        _q62_uniq_combinators,
        _Q62_ORACLE,
    ),
    QuerySpec(
        "q63_weighted_median",
        "quantileExactWeighted(0.5) via cumulative-weight windows",
        _q63_weighted_median,
        _Q63_ORACLE,
    ),
    QuerySpec(
        "q64_bitmap_ops",
        "bitmap And/Or/Andnot cardinalities as cohort set algebra",
        _q64_bitmap_ops,
        _Q64_ORACLE,
    ),
    QuerySpec(
        "q65_running_difference",
        "runningDifference/runningAccumulate over a daily series",
        _q65_running_difference,
        _Q65_ORACLE,
    ),
    QuerySpec(
        "q66_limit_by",
        "LIMIT n BY group (per-group top-n, partition-local sort)",
        _q66_limit_by,
        _Q66_ORACLE,
    ),
    QuerySpec(
        "q67_format_datetime",
        "formatDateTime string formatting as aggregation keys",
        _q67_format_datetime,
        _Q67_ORACLE,
    ),
    QuerySpec(
        "q68_group_uniq_array",
        "groupUniqArray distinct-set aggregation (sorted arrays)",
        _q68_group_uniq_array,
        _Q68_ORACLE,
    ),
    QuerySpec(
        "q70_multi_search",
        "multiSearchAny / position substring family",
        _q70_multi_search,
        _Q70_ORACLE,
    ),
    QuerySpec(
        "q71_array_zip",
        "arrayZip + tuple argmax without explode",
        _q71_array_zip,
        _Q71_ORACLE,
    ),
    QuerySpec(
        "q72_pad_trim",
        "leftPad/rightPad/trim/startsWith/endsWith string family",
        _q72_pad_trim,
        _Q72_ORACLE,
    ),
    QuerySpec(
        "q73_weighted_aggs",
        "avgWeighted + deltaSum (ordered positive-delta aggregate)",
        _q73_weighted_aggs,
        _Q73_ORACLE,
    ),
    QuerySpec(
        "q74_array_cum",
        "arrayCumSum / arrayDifference per-row folds",
        _q74_array_cum,
        _Q74_ORACLE,
    ),
    QuerySpec(
        "q75_entropy",
        "entropy() aggregate (Shannon entropy per key)",
        _q75_entropy,
        _Q75_ORACLE,
    ),
    QuerySpec(
        "q76_linreg",
        "simpleLinearRegression via algebraic sums",
        _q76_linreg,
        _Q76_ORACLE,
    ),
]
