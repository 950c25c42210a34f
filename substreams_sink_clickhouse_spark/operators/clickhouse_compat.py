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

Scale design: every aggregate here is algebraic (map-side partials,
one shuffle on the group key); the only collect-based state is
q55's per-user event string, which is bounded by events-per-user —
the same bound ClickHouse's sequenceMatch state carries per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
]
