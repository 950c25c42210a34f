"""ClickHouse statistical/sessionization family, third batch (q85–q90).

Completes the ClickHouse analytics families a reference user would
reach for (the reference's whole query surface is ClickHouse SQL,
/root/reference/README.md:29-52):

* ``q85_welch_ttest``   — ``welchTTest(a, b)``: the t statistic and
  Welch–Satterthwaite df from six algebraic moments (no per-row state).
* ``q86_cramers_v``     — ``cramersV(x, y)``: χ² over the contingency
  table of two categoricals, normalized.
* ``q87_sessionize``    — gaps-and-islands sessionization (the batch
  dual of ``session_window``): 30-min inactivity gap → session ids via
  lag-flag + running sum, one sort per user partition.
* ``q88_minmap``        — ``minMap``/``maxMap`` combinators: keywise
  min/max of map-valued aggregation state (explode → algebraic agg →
  sorted rebuild, same skeleton as q58's ``sumMap``).
* ``q89_sequence_count`` — ``sequenceCount('(?1)(?2)')``: non-
  overlapping pattern occurrences per user via the ordered event
  string + ``regexp_count``.
* ``q90_mode``          — ``topK(1)`` / exact mode with deterministic
  smallest-value tie-break.

Scale notes: q85/q86 are one or two stacked algebraic aggregates —
constant-size state per group, map-side partials, one exchange.
q87/q89 sort only inside user partitions (the session/sequence state
per user is exactly ClickHouse's per-group state bound).  q88's
exchange carries one row per (bucket, map-key) — map cardinality, not
row count.  q90 ranks pre-aggregated (group, value) counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from substreams_sink_clickhouse_spark.operators.spec import QuerySpec
from substreams_sink_clickhouse_spark.sources.tables import load_table


# ------------------------------------------------------------ welchTTest

def _q85_welch_ttest(spark: SparkSession, sf: str) -> DataFrame:
    """welchTTest(value of 'click', value of 'purchase'): t statistic
    and Welch–Satterthwaite degrees of freedom from per-group
    (n, mean, var_samp) — six algebraic moments, one aggregate pass."""
    e = load_table(spark, sf, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("v"),
    )
    a = g.filter(F.col("event_type") == "click").select(
        F.col("n").alias("n1"), F.col("m").alias("m1"), F.col("v").alias("v1")
    )
    b = g.filter(F.col("event_type") == "purchase").select(
        F.col("n").alias("n2"), F.col("m").alias("m2"), F.col("v").alias("v2")
    )
    # both sides are 1-row moment frames; broadcast makes the
    # bounded-ness explicit (a 1x1 product, never a data join)
    j = a.crossJoin(F.broadcast(b))
    se2_1 = F.col("v1") / F.col("n1")
    se2_2 = F.col("v2") / F.col("n2")
    t = (F.col("m1") - F.col("m2")) / F.sqrt(se2_1 + se2_2)
    df = F.pow(se2_1 + se2_2, 2) / (
        F.pow(se2_1, 2) / (F.col("n1") - 1) + F.pow(se2_2, 2) / (F.col("n2") - 1)
    )
    return j.select(
        F.round(t, 6).alias("t_stat"),
        F.round(df, 4).alias("welch_df"),
    )


_Q85_ORACLE = """
SELECT round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
       round(pow(v1 / n1 + v2 / n2, 2)
             / (pow(v1 / n1, 2) / (n1 - 1) + pow(v2 / n2, 2) / (n2 - 1)), 4) AS welch_df
FROM (SELECT count(*)::DOUBLE n1, avg(value) m1, var_samp(value) v1
      FROM events WHERE event_type = 'click'),
     (SELECT count(*)::DOUBLE n2, avg(value) m2, var_samp(value) v2
      FROM events WHERE event_type = 'purchase')
"""


# ------------------------------------------------------------- cramersV

def _q86_cramers_v(spark: SparkSession, sf: str) -> DataFrame:
    """cramersV(event_type, k mod 5): χ² over the contingency table,
    normalized to [0,1].  Cell counts pre-aggregate (cardinality =
    |types| × 5, not row count); marginals broadcast back."""
    e = load_table(spark, sf, "events")
    base = e.select(
        "event_type",
        (F.get_json_object("props", "$.k").cast("bigint") % 5).alias("kb"),
    )
    cells = base.groupBy("event_type", "kb").agg(F.count(F.lit(1)).cast("double").alias("o"))
    rows = base.groupBy("event_type").agg(F.count(F.lit(1)).cast("double").alias("rm"))
    cols = base.groupBy("kb").agg(F.count(F.lit(1)).cast("double").alias("cm"))
    n = base.count()  # tiny scalar; the driver folds it into the plan as a literal
    chi2 = (
        cells.join(F.broadcast(rows), "event_type")
        .join(F.broadcast(cols), "kb")
        .select(
            (
                F.pow(F.col("o") - F.col("rm") * F.col("cm") / F.lit(float(n)), 2)
                / (F.col("rm") * F.col("cm") / F.lit(float(n)))
            ).alias("term")
        )
        .agg(F.sum("term").alias("chi2"))
    )
    r_cnt = rows.count()
    c_cnt = cols.count()
    return chi2.select(
        F.round(
            F.sqrt(F.col("chi2") / (float(n) * (min(r_cnt, c_cnt) - 1))), 6
        ).alias("cramers_v")
    )


_Q86_ORACLE = """
WITH base AS (
  SELECT event_type, json_extract(props, '$.k')::BIGINT % 5 AS kb FROM events),
cells AS (SELECT event_type, kb, count(*)::DOUBLE o FROM base GROUP BY 1, 2),
rm AS (SELECT event_type, count(*)::DOUBLE rm FROM base GROUP BY 1),
cm AS (SELECT kb, count(*)::DOUBLE cm FROM base GROUP BY 1),
n AS (SELECT count(*)::DOUBLE n FROM base),
chi2 AS (
  SELECT sum(pow(o - rm * cm / n, 2) / (rm * cm / n)) AS chi2
  FROM cells JOIN rm USING (event_type) JOIN cm USING (kb), n)
SELECT round(sqrt(chi2 / (n * (least((SELECT count(*) FROM rm),
                                     (SELECT count(*) FROM cm)) - 1))), 6) AS cramers_v
FROM chi2, n
"""


# ---------------------------------------------------- gaps-and-islands

def _q87_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Batch sessionization: a 30-minute inactivity gap opens a new
    session.  lag-flag + running sum inside ONE per-user sort — the
    batch dual of session_window (q24), and the shape ClickHouse users
    build with arraySort/arrayDifference over groupArray state."""
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_flag = F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0))
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = e.withColumn("session_id", F.sum(new_flag).over(cum))
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
                "duration_s"
            ),
        )
        .orderBy("user_id", "session_id")
        .limit(500)
    )


_Q87_ORACLE = """
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       date_diff('second', min(ts), max(ts)) AS duration_s
FROM (
  SELECT user_id, ts,
         sum(CASE WHEN prev_ts IS NULL
                  OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM (
    SELECT user_id, ts, event_id,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events))
GROUP BY user_id, session_id
ORDER BY user_id, session_id LIMIT 500
"""


# -------------------------------------------------------- minMap/maxMap

def _q88_minmap(spark: SparkSession, sf: str) -> DataFrame:
    """minMap/maxMap: keywise min/max over map-valued state.  Each
    event contributes a one-entry map {event_type: value}; the
    aggregate folds maps keywise per user bucket.  Explode → algebraic
    min/max per (bucket, key) → sorted rebuild (q58's sumMap skeleton;
    the exchange carries map cardinality, not row count)."""
    e = load_table(spark, sf, "events")
    per_key = (
        e.withColumn("bucket", (F.col("user_id") % 5).cast("bigint"))
        .groupBy("bucket", "event_type")
        .agg(
            F.round(F.min("value"), 4).alias("mn"),
            F.round(F.max("value"), 4).alias("mx"),
        )
    )
    # rendered as deterministic "k:v" strings (q58's convention) so the
    # oracle compares content, not engine-specific map encodings
    def rendered(val: str, alias: str):
        return F.expr(
            "array_join(transform(array_sort(collect_list(struct(event_type, "
            f"{val}))), x -> concat(x.event_type, ':', CAST(x.{val} AS STRING))), ';')"
        ).alias(alias)

    return (
        per_key.groupBy("bucket")
        .agg(rendered("mn", "min_map"), rendered("mx", "max_map"))
        .orderBy("bucket")
    )


_Q88_ORACLE = """
SELECT bucket,
       string_agg(concat(event_type, ':', CAST(mn AS VARCHAR)), ';' ORDER BY event_type) AS min_map,
       string_agg(concat(event_type, ':', CAST(mx AS VARCHAR)), ';' ORDER BY event_type) AS max_map
FROM (
  SELECT user_id % 5 AS bucket, event_type,
         round(min(value), 4) AS mn, round(max(value), 4) AS mx
  FROM events GROUP BY 1, 2)
GROUP BY bucket ORDER BY bucket
"""


# ------------------------------------------------------- sequenceCount

def _q89_sequence_count(spark: SparkSession, sf: str) -> DataFrame:
    """sequenceCount('(?1)(?2)') with cond1=view, cond2=click:
    non-overlapping view→click adjacencies per user, counted on the
    ordered per-user event-initial string (bounded by events-per-user,
    ClickHouse's own sequence-state bound)."""
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tagged = e.withColumn(
        "sym",
        F.when(F.col("event_type") == "view", F.lit("v"))
        .when(F.col("event_type") == "click", F.lit("c"))
        .otherwise(F.lit("x")),
    ).withColumn("rn", F.row_number().over(w))
    seq = tagged.groupBy("user_id").agg(
        F.concat_ws("", F.array_sort(F.collect_list(F.struct("rn", "sym"))).getField("sym")).alias("s")
    )
    counted = seq.select(
        "user_id", F.regexp_count(F.col("s"), F.lit("vc")).alias("n_vc")
    )
    return (
        counted.groupBy("n_vc")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("n_vc")
    )


_Q89_ORACLE = """
SELECT n_vc, count(*) AS n_users
FROM (
  SELECT user_id, len(regexp_extract_all(s, 'vc')) AS n_vc
  FROM (
    SELECT user_id,
           string_agg(CASE event_type WHEN 'view' THEN 'v'
                                      WHEN 'click' THEN 'c' ELSE 'x' END, ''
                      ORDER BY ts, event_id) AS s
    FROM events GROUP BY user_id))
GROUP BY n_vc ORDER BY n_vc
"""


# ----------------------------------------------------------- exact mode

def _q90_mode(spark: SparkSession, sf: str) -> DataFrame:
    """Exact mode per group with deterministic smallest-value
    tie-break (ClickHouse topK(1)/anyHeavy made exact): rank
    pre-aggregated (group, value) counts — the sort input is value
    cardinality, never the raw rows."""
    l = load_table(spark, sf, "lineitem")
    counts = l.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("cnt"), "l_quantity")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"), "cnt")
        .orderBy("l_returnflag")
    )


_Q90_ORACLE = """
SELECT l_returnflag, mode_qty, cnt
FROM (
  SELECT l_returnflag, l_quantity AS mode_qty, cnt,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY cnt DESC, l_quantity) AS rk
  FROM (
    SELECT l_returnflag, l_quantity, count(*) AS cnt
    FROM lineitem GROUP BY 1, 2))
WHERE rk = 1 ORDER BY l_returnflag
"""


SPECS = [
    QuerySpec(
        "q85_welch_ttest",
        "welchTTest: t statistic + Welch df from algebraic moments",
        _q85_welch_ttest,
        _Q85_ORACLE,
    ),
    QuerySpec(
        "q86_cramers_v",
        "cramersV: chi-square contingency association, normalized",
        _q86_cramers_v,
        _Q86_ORACLE,
    ),
    QuerySpec(
        "q87_sessionize",
        "Gaps-and-islands sessionization (batch session_window dual)",
        _q87_sessionize,
        _Q87_ORACLE,
    ),
    QuerySpec(
        "q88_minmap",
        "minMap/maxMap keywise map-state aggregation",
        _q88_minmap,
        _Q88_ORACLE,
    ),
    QuerySpec(
        "q89_sequence_count",
        "sequenceCount non-overlapping pattern occurrences",
        _q89_sequence_count,
        _Q89_ORACLE,
    ),
    QuerySpec(
        "q90_mode",
        "Exact mode with deterministic tie-break (topK(1) exact)",
        _q90_mode,
        _Q90_ORACLE,
    ),
]


# --------------------------------------------------- skew-salted join

def _q91_skew_salted_join(spark: SparkSession, sf: str) -> DataFrame:
    """Hot-key join through the skew-salting path: l_returnflag has 3
    values, so a returnflag-keyed fact⋈dim join is maximally skewed —
    the worst case for one reducer.  ``salted_join`` scatters each hot
    key over 16 sub-partitions and ``two_phase_agg`` combines salted
    partial sums, so no single task ever owns a whole key.  The oracle
    is the PLAIN join+group SQL: salting must be invisible in the
    result (functions/skew.py's contract).
    """
    from substreams_sink_clickhouse_spark.functions.skew import (
        salted_join,
        two_phase_agg,
    )

    l = load_table(spark, sf, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_discount"
    )
    flags = (
        load_table(spark, sf, "lineitem")
        .select("l_returnflag")
        .distinct()
        .withColumn("flag_tag", F.concat(F.lit("flag:"), F.col("l_returnflag")))
    )
    joined = salted_join(l, flags, on=["l_returnflag"], n_salts=16)
    return two_phase_agg(
        joined,
        keys=["flag_tag"],
        partial_aggs=[
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("ps"),
            F.count(F.lit(1)).alias("pc"),
        ],
        final_aggs=[
            F.round(F.sum("ps"), 2).alias("revenue"),
            F.sum("pc").alias("n_rows"),
        ],
    ).orderBy("flag_tag")


_Q91_ORACLE = """
SELECT concat('flag:', l_returnflag) AS flag_tag,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag ORDER BY flag_tag
"""


SPECS.append(
    QuerySpec(
        "q91_skew_salted_join",
        "Hot-key join via salting + two-phase agg; oracle is the plain join",
        _q91_skew_salted_join,
        _Q91_ORACLE,
    )
)


# ------------------------------------------------------------ arrayAUC

def _q98_auc(spark: SparkSession, sf: str) -> DataFrame:
    """ROC AUC (ClickHouse ``arrayAUC``) of ``value`` as a score for
    "event is a purchase", by the Mann-Whitney U statistic with exact
    tie handling: group scores to distinct values (np/nn counts), one
    ordered pass accumulates negatives-below, and
    AUC = Σ np·(nn_below + nn_at/2) / (P·N).  The only sort is over
    DISTINCT score values — score cardinality, not event count — and
    every aggregate is algebraic."""
    e = load_table(spark, sf, "events")
    labeled = e.select(
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    per_score = labeled.groupBy("score").agg(
        F.sum("y").alias("np"),
        F.sum(1 - F.col("y")).alias("nn"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    stats = per_score.select(
        "np",
        "nn",
        F.coalesce(F.sum("nn").over(w), F.lit(0)).alias("nn_below"),
    )
    return stats.agg(
        F.round(
            F.sum(F.col("np") * (F.col("nn_below") + F.col("nn") / 2.0))
            / (F.sum("np") * F.sum("nn")),
            6,
        ).alias("auc")
    )


_Q98_ORACLE = """
WITH labeled AS (
  SELECT value AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events),
per_score AS (
  SELECT score, sum(y) AS np, sum(1 - y) AS nn
  FROM labeled GROUP BY score),
stats AS (
  SELECT np, nn,
         coalesce(sum(nn) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nn_below
  FROM per_score)
SELECT round(sum(np * (nn_below + nn / 2.0)) / (sum(np) * sum(nn)), 6) AS auc
FROM stats
"""


SPECS.append(
    QuerySpec(
        "q98_auc",
        "ROC AUC (arrayAUC) via Mann-Whitney with exact tie handling",
        _q98_auc,
        _Q98_ORACLE,
    )
)


# -------------------------------------------- array set algebra

def _q99_array_setops(spark: SparkSession, sf: str) -> DataFrame:
    """arrayIntersect / arrayUnion (as distinct concat) / arrayExcept:
    row-local set algebra between each part name's word set and a
    reference vocabulary — pure codegen projections; results rendered
    as sorted CSV strings so the driver's pandas canonicalizer can
    hash them and internal ordering conventions can't differ."""
    p = load_table(spark, sf, "part")
    vocab = F.array(*[F.lit(x) for x in ("red", "ring", "bolt")])
    words = F.array_distinct(F.split("p_name", " "))
    return (
        p.select(
            "p_partkey",
            F.array_join(F.sort_array(F.array_intersect(words, vocab)), ",").alias("common"),
            F.array_join(F.sort_array(F.array_union(words, vocab)), ",").alias("united"),
            F.array_join(F.sort_array(F.array_except(words, vocab)), ",").alias("only_name"),
        )
        .orderBy("p_partkey")
        .limit(300)
    )


_Q99_ORACLE = """
SELECT p_partkey,
       coalesce(list_aggregate(list_sort(list_intersect(ws, ['red', 'ring', 'bolt'])), 'string_agg', ','), '') AS common,
       coalesce(list_aggregate(list_sort(list_distinct(ws || ['red', 'ring', 'bolt'])), 'string_agg', ','), '') AS united,
       coalesce(list_aggregate(list_sort(list_filter(ws, x -> NOT list_contains(['red', 'ring', 'bolt'], x))), 'string_agg', ','), '') AS only_name
FROM (SELECT p_partkey, list_distinct(string_split(p_name, ' ')) AS ws FROM part)
ORDER BY p_partkey LIMIT 300
"""


SPECS.append(
    QuerySpec(
        "q99_array_setops",
        "arrayIntersect/arrayUnion/arrayExcept row-local set algebra",
        _q99_array_setops,
        _Q99_ORACLE,
    )
)
