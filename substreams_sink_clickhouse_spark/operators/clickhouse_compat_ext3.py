"""ClickHouse compatibility, fourth batch (q111–q117): interval
aggregates, nonparametric tests, and bitwise aggregates.

The reference delegates its entire query surface to ClickHouse
(/root/reference/README.md:29-52); these are the remaining analytics
families a ClickHouse user would reach for that earlier batches don't
cover:

* ``q111_interval_length_sum`` — ``intervalLengthSum(start, end)``:
  total length of the union of (possibly overlapping) segments per
  key.  Gaps-and-islands: running max of interval ends marks island
  starts, islands aggregate to ``max(end) - min(start)``.
* ``q112_max_intersections`` — ``maxIntersections(start, end)``: the
  maximum number of simultaneously-open half-open intervals, via the
  classic sweep (explode to +1/-1 events, running sum, max).
* ``q113_theils_u``   — ``theilsU(x, y)``: uncertainty coefficient
  U(x|y) = (H(x) − H(x|y)) / H(x) from contingency-cell counts.
* ``q114_ks_test``    — ``kolmogorovSmirnovTest``: two-sample exact
  KS D statistic as the max ECDF gap over value-grouped counts.
* ``q115_mannwhitney_u`` — ``mannWhitneyUTest``: rank-sum U with
  average ranks for ties (computed from value-grouped counts, no
  per-row ranking) and the normal-approximation z score (no tie
  correction — documented deviation).
* ``q116_bit_aggs``   — ``groupBitAnd/Or/Xor``: Spark's bit_and /
  bit_or / bit_xor aggregates.
* ``q117_bounding_ratio`` — ``boundingRatio(x, y)``: slope of the
  bounding box, (max y − min y) / (max x − min x), pure algebraic
  moments.

Scale notes.  q111/q112 sort only inside their group partitions (the
per-key interval set is the state bound, exactly ClickHouse's).
q113/q116/q117 are stacked algebraic aggregates — constant state,
map-side partials, one exchange each.  q114/q115 first collapse rows
to (value, per-sample counts) — the exchange carries value
*cardinality*, not row count — then window over the grouped values;
at extreme value cardinality the ECDF should be binned (approximate
KS), which is the documented 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from substreams_sink_clickhouse_spark.operators.spec import QuerySpec
from substreams_sink_clickhouse_spark.sources.tables import load_table


# ------------------------------------------------- intervalLengthSum

def _intervals(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic integer intervals derived from orders: start =
    orderkey mod 1000, end = start + custkey mod 50 + 1, keyed by
    order status.  Integer arithmetic only — oracle-exact."""
    o = load_table(spark, sf, "orders")
    return o.select(
        F.col("o_orderstatus").alias("k"),
        F.col("o_orderkey").alias("oid"),
        (F.col("o_orderkey") % 1000).alias("s"),
        ((F.col("o_orderkey") % 1000) + F.col("o_custkey") % 50 + 1).alias("e"),
    )


def interval_length_sum(iv: DataFrame) -> DataFrame:
    """intervalLengthSum core over any ``(k, oid, s, e)`` DataFrame —
    shared by the gate entry and the brute-force property tests."""
    w = Window.partitionBy("k").orderBy("s", "e", "oid")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "new_island",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island", F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_island = islands.groupBy("k", "island").agg(
        (F.max("e") - F.min("s")).alias("len")
    )
    return (
        per_island.groupBy("k")
        .agg(F.sum("len").alias("union_len"))
        .orderBy("k")
    )


def _q111_interval_length_sum(spark: SparkSession, sf: str) -> DataFrame:
    """intervalLengthSum(s, e) per key: union length of overlapping
    segments.  prev_max(end) over the start-ordered group marks island
    boundaries; islands collapse to max(e) - min(s).  Touching
    segments may split islands — the summed length is identical either
    way, so both engines agree without a tie policy."""
    return interval_length_sum(_intervals(spark, sf))


_Q111_ORACLE = """
WITH iv AS (
  SELECT o_orderstatus AS k, o_orderkey AS oid,
         o_orderkey % 1000 AS s,
         o_orderkey % 1000 + o_custkey % 50 + 1 AS e
  FROM orders),
flagged AS (
  SELECT k, s, e,
         CASE WHEN max(e) OVER (PARTITION BY k ORDER BY s, e, oid
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   IS NULL
              OR s > max(e) OVER (PARTITION BY k ORDER BY s, e, oid
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island,
         oid
  FROM iv),
islands AS (
  SELECT k, s, e,
         sum(new_island) OVER (PARTITION BY k ORDER BY s, e, oid
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged)
SELECT k, CAST(sum(len) AS BIGINT) AS union_len FROM (
  SELECT k, island, max(e) - min(s) AS len FROM islands GROUP BY k, island)
GROUP BY k ORDER BY k
"""


# ------------------------------------------------- maxIntersections

def max_intersections(iv: DataFrame) -> DataFrame:
    """maxIntersections core over any ``(k, s, e)`` DataFrame."""
    pts = iv.select(
        "k", F.col("s").alias("pos"), F.lit(1).alias("delta")
    ).unionAll(iv.select("k", F.col("e").alias("pos"), F.lit(-1).alias("delta")))
    w = (
        Window.partitionBy("k")
        .orderBy("pos", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = pts.withColumn("open", F.sum("delta").over(w))
    return (
        running.groupBy("k")
        .agg(F.max("open").cast("int").alias("max_intersections"))
        .orderBy("k")
    )


def _q112_max_intersections(spark: SparkSession, sf: str) -> DataFrame:
    """maxIntersections(s, e) per key over half-open [s, e): sweep the
    +1/-1 endpoint events in (position, delta) order — at equal
    position the -1 sorts first, so a segment ending where another
    starts does not count as an intersection (half-open semantics)."""
    return max_intersections(_intervals(spark, sf))


_Q112_ORACLE = """
WITH iv AS (
  SELECT o_orderstatus AS k,
         o_orderkey % 1000 AS s,
         o_orderkey % 1000 + o_custkey % 50 + 1 AS e
  FROM orders),
pts AS (
  SELECT k, s AS pos, 1 AS delta FROM iv
  UNION ALL
  SELECT k, e AS pos, -1 AS delta FROM iv)
SELECT k, CAST(max(open) AS INT) AS max_intersections FROM (
  SELECT k, sum(delta) OVER (PARTITION BY k ORDER BY pos, delta
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
  FROM pts)
GROUP BY k ORDER BY k
"""


# ------------------------------------------------------- theilsU

def _q113_theils_u(spark: SparkSession, sf: str) -> DataFrame:
    """theilsU(event_type, user_id mod 7): uncertainty coefficient
    U(x|y) = (H(x) - H(x|y)) / H(x) with natural-log entropies.  All
    terms derive from contingency-cell counts (|x|*|y| rows cross the
    exchange, not the event count).  The plan stacks several more
    exchanges than most entries (tools/plan_sweep.py flags it), but
    every one past the first carries cell cardinality (~35 rows here)
    — the event-volume exchange happens exactly once."""
    e = load_table(spark, sf, "events").select(
        F.col("event_type").alias("x"), (F.col("user_id") % 7).alias("y")
    )
    return theils_u(e)


def theils_u(pairs: DataFrame) -> DataFrame:
    """Uncertainty-coefficient core over any ``(x, y)`` DataFrame.

    Join-free formulation: fold the marginal sums into per-cell terms
    so both entropies are single aggregates over the contingency cells
    —  H(x) = -Σ_cells (nxy/n)·ln(nx/n)  (Σ_cells within x of nxy = nx)
    and H(x|y) = -Σ_cells (nxy/n)·ln(nxy/ny).  The marginals nx/ny/n
    come from window sums over the cells relation, which carries
    |x|·|y| rows (~35 here), never the event count — the event-volume
    exchange happens exactly once, in the groupBy.  Earlier revisions
    assembled the scalars with 1-row broadcast crossJoins, which
    planned as BroadcastNestedLoopJoins (benign but flagged by the
    plan sweep since round 4); windows keep the whole plan
    join-free."""
    cells = pairs.groupBy("x", "y").agg(F.count(F.lit(1)).cast("double").alias("nxy"))
    enriched = cells.select(
        "nxy",
        F.sum("nxy").over(Window.partitionBy()).alias("n"),
        F.sum("nxy").over(Window.partitionBy("x")).alias("nx"),
        F.sum("nxy").over(Window.partitionBy("y")).alias("ny"),
    )
    hx = -F.sum((F.col("nxy") / F.col("n")) * F.log(F.col("nx") / F.col("n")))
    hxy = -F.sum((F.col("nxy") / F.col("n")) * F.log(F.col("nxy") / F.col("ny")))
    return enriched.agg(F.round((hx - hxy) / hx, 6).alias("theils_u"))


_Q113_ORACLE = """
WITH e AS (SELECT event_type AS x, user_id % 7 AS y FROM events),
cells AS (SELECT x, y, count(*)::DOUBLE AS nxy FROM e GROUP BY x, y),
tot AS (SELECT sum(nxy) AS n FROM cells),
hx AS (
  SELECT -sum((nx / n) * ln(nx / n)) AS hx
  FROM (SELECT x, sum(nxy) AS nx FROM cells GROUP BY x), tot),
hxy AS (
  SELECT -sum((ny / n) * (nxy / ny) * ln(nxy / ny)) AS hxy
  FROM cells
  JOIN (SELECT y, sum(nxy) AS ny FROM cells GROUP BY y) USING (y), tot)
SELECT round((hx - hxy) / hx, 6) AS theils_u FROM hx, hxy
"""


# ------------------------------------------------------- KS test

def _q114_ks_test(spark: SparkSession, sf: str) -> DataFrame:
    """kolmogorovSmirnovTest over events.value, 'click' vs 'purchase':
    exact two-sample D = max |ECDF_a - ECDF_b|.  Rows first collapse
    to per-distinct-value counts, so the window runs over value
    cardinality; the running sums use a ROWS frame over the grouped
    (hence tie-free) values."""
    e = load_table(spark, sf, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    samples = e.select(
        F.col("value").alias("v"),
        (F.col("event_type") == "click").alias("is_a"),
    )
    return ks_test(samples)


def ks_test(samples: DataFrame) -> DataFrame:
    """Two-sample KS core over any ``(v, is_a)`` DataFrame."""
    byv = samples.groupBy("v").agg(
        F.count(F.when(F.col("is_a"), 1)).cast("double").alias("ca"),
        F.count(F.when(~F.col("is_a"), 1)).cast("double").alias("cb"),
    )
    tot = byv.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = byv.select(
        F.sum("ca").over(w).alias("cca"), F.sum("cb").over(w).alias("ccb")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(F.abs(F.col("cca") / F.col("na") - F.col("ccb") / F.col("nb")).alias("gap"))
        .agg(F.round(F.max("gap"), 6).alias("ks_d"))
    )


_Q114_ORACLE = """
WITH e AS (SELECT value AS v, event_type FROM events
           WHERE event_type IN ('click', 'purchase')),
byv AS (
  SELECT v,
         count(*) FILTER (event_type = 'click')::DOUBLE AS ca,
         count(*) FILTER (event_type = 'purchase')::DOUBLE AS cb
  FROM e GROUP BY v),
tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM byv),
cum AS (
  SELECT sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cca,
         sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ccb
  FROM byv)
SELECT round(max(abs(cca / na - ccb / nb)), 6) AS ks_d FROM cum, tot
"""


# ------------------------------------------------- mannWhitneyUTest

def _q115_mannwhitney_u(spark: SparkSession, sf: str) -> DataFrame:
    """mannWhitneyUTest over events.value, 'click' vs 'purchase':
    rank-sum U1 with average ranks for ties, computed from
    per-distinct-value counts (rank of a tied block = preceding count
    + (block + 1) / 2 — no per-row ranking pass), plus the normal
    z approximation without tie correction (documented deviation)."""
    e = load_table(spark, sf, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    samples = e.select(
        F.col("value").alias("v"),
        (F.col("event_type") == "click").alias("is_a"),
    )
    return mannwhitney_u(samples)


def mannwhitney_u(samples: DataFrame) -> DataFrame:
    """Rank-sum U core over any ``(v, is_a)`` DataFrame."""
    byv = samples.groupBy("v").agg(
        F.count(F.when(F.col("is_a"), 1)).cast("double").alias("ca"),
        F.count(F.lit(1)).cast("double").alias("ct"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = byv.withColumn("before", F.coalesce(F.sum("ct").over(w), F.lit(0.0)))
    rsum = ranked.select(
        (F.col("ca") * (F.col("before") + (F.col("ct") + 1) / 2)).alias("ra"),
        "ca",
        "ct",
    ).agg(
        F.sum("ra").alias("r1"),
        F.sum("ca").alias("n1"),
        (F.sum("ct") - F.sum("ca")).alias("n2"),
    )
    u1 = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2
    mu = F.col("n1") * F.col("n2") / 2
    sigma = F.sqrt(
        F.col("n1") * F.col("n2") * (F.col("n1") + F.col("n2") + 1) / 12
    )
    return rsum.select(
        F.round(u1, 2).alias("u1"), F.round((u1 - mu) / sigma, 6).alias("z")
    )


_Q115_ORACLE = """
WITH e AS (SELECT value AS v, event_type FROM events
           WHERE event_type IN ('click', 'purchase')),
byv AS (
  SELECT v,
         count(*) FILTER (event_type = 'click')::DOUBLE AS ca,
         count(*)::DOUBLE AS ct
  FROM e GROUP BY v),
ranked AS (
  SELECT ca, ct,
         coalesce(sum(ct) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS before
  FROM byv),
s AS (
  SELECT sum(ca * (before + (ct + 1) / 2)) AS r1,
         sum(ca) AS n1, sum(ct) - sum(ca) AS n2
  FROM ranked)
SELECT round(r1 - n1 * (n1 + 1) / 2, 2) AS u1,
       round((r1 - n1 * (n1 + 1) / 2 - n1 * n2 / 2)
             / sqrt(n1 * n2 * (n1 + n2 + 1) / 12), 6) AS z
FROM s
"""


# ------------------------------------------------------- bit aggregates

def _q116_bit_aggs(spark: SparkSession, sf: str) -> DataFrame:
    """groupBitAnd / groupBitOr / groupBitXor of orderkey mod 4096 per
    order priority — single algebraic aggregate, map-side partials."""
    o = load_table(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("pri"), (F.col("o_orderkey") % 4096).alias("b")
    )
    return (
        o.groupBy("pri")
        .agg(
            F.bit_and("b").alias("band"),
            F.bit_or("b").alias("bor"),
            F.bit_xor("b").alias("bxor"),
        )
        .orderBy("pri")
    )


_Q116_ORACLE = """
SELECT o_orderpriority AS pri,
       bit_and(o_orderkey % 4096) AS band,
       bit_or(o_orderkey % 4096) AS bor,
       bit_xor(o_orderkey % 4096) AS bxor
FROM orders GROUP BY pri ORDER BY pri
"""


# ------------------------------------------------------ boundingRatio

def _q117_bounding_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """boundingRatio(epoch(ts), value) per event type: the slope of
    the min/max bounding box — four algebraic moments."""
    e = load_table(spark, sf, "events").select(
        F.col("event_type").alias("et"),
        F.unix_timestamp("ts").cast("double").alias("x"),
        F.col("value").alias("y"),
    )
    return (
        e.groupBy("et")
        .agg(
            F.round(
                (F.max("y") - F.min("y")) / (F.max("x") - F.min("x")), 9
            ).alias("bounding_ratio")
        )
        .orderBy("et")
    )


_Q117_ORACLE = """
SELECT event_type AS et,
       round((max(value) - min(value)) / (max(epoch(ts)) - min(epoch(ts))), 9)
         AS bounding_ratio
FROM events GROUP BY et ORDER BY et
"""


SPECS = [
    QuerySpec(
        "q111_interval_length_sum",
        "intervalLengthSum: union length of overlapping segments per key",
        _q111_interval_length_sum,
        _Q111_ORACLE,
    ),
    QuerySpec(
        "q112_max_intersections",
        "maxIntersections: peak concurrent half-open intervals per key",
        _q112_max_intersections,
        _Q112_ORACLE,
    ),
    QuerySpec(
        "q113_theils_u",
        "theilsU: uncertainty coefficient U(x|y) from contingency cells",
        _q113_theils_u,
        _Q113_ORACLE,
    ),
    QuerySpec(
        "q114_ks_test",
        "kolmogorovSmirnovTest: exact two-sample KS D over grouped values",
        _q114_ks_test,
        _Q114_ORACLE,
    ),
    QuerySpec(
        "q115_mannwhitney_u",
        "mannWhitneyUTest: tie-averaged rank-sum U and z approximation",
        _q115_mannwhitney_u,
        _Q115_ORACLE,
    ),
    QuerySpec(
        "q116_bit_aggs",
        "groupBitAnd/Or/Xor bitwise aggregates",
        _q116_bit_aggs,
        _Q116_ORACLE,
    ),
    QuerySpec(
        "q117_bounding_ratio",
        "boundingRatio: bounding-box slope from algebraic moments",
        _q117_bounding_ratio,
        _Q117_ORACLE,
    ),
]


# ------------------------------------------------------- PASTE JOIN

def _q118_paste_join(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse ``PASTE JOIN`` (positional zip of two result sets):
    the i-th row of the left side pairs with the i-th row of the
    right.  Spark-first: both sides are made *deterministically
    ordered and bounded* (top-100 with full tie-breaks), positions
    assigned with row_number, then an equi-join on position.

    Scale contract: positional semantics require a total order, so
    the sides must be bounded (LIMIT) or carry an explicit ordering
    column — same contract ClickHouse imposes (block order).  Bounded
    sides broadcast; nothing shuffles."""
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    t1 = (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.desc("o_totalprice"), "o_orderkey")
            ),
        )
        .select("rn", "o_orderkey", "o_totalprice")
    )
    t2 = (
        c.orderBy(F.desc("c_acctbal"), "c_custkey")
        .limit(100)
        .withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.desc("c_acctbal"), "c_custkey")),
        )
        .select("rn", "c_custkey", "c_acctbal")
    )
    return (
        t1.join(F.broadcast(t2), "rn")
        .select("rn", "o_orderkey", "o_totalprice", "c_custkey", "c_acctbal")
        .orderBy("rn")
    )


_Q118_ORACLE = """
WITH t1 AS (
  SELECT row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn,
         o_orderkey, o_totalprice
  FROM (SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100)),
t2 AS (
  SELECT row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rn,
         c_custkey, c_acctbal
  FROM (SELECT * FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 100))
SELECT rn, o_orderkey, o_totalprice, c_custkey, c_acctbal
FROM t1 JOIN t2 USING (rn) ORDER BY rn
"""


# --------------------------------------- WITH FILL ... INTERPOLATE

def _q119_interpolate(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse ``ORDER BY h WITH FILL STEP 1 HOUR INTERPOLATE``:
    the per-user hourly spine of q47, but gaps filled by LINEAR
    interpolation between the surrounding observed values (edges
    clamp to the nearest observation).

    Same scale shape as q47: spine generation is partition-local, the
    two ignore-nulls windows sort once per user partition."""
    e = load_table(spark, sf, "events").filter(F.col("user_id") < 10)
    rn_w = Window.partitionBy("user_id", "h").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    hourly = (
        e.withColumn("h", F.date_trunc("hour", "ts"))
        .withColumn("rn", F.row_number().over(rn_w))
        .filter(F.col("rn") == 1)
        .select("user_id", "h", F.col("value").alias("v"))
    )
    return interpolate_hourly(hourly)


def interpolate_hourly(hourly: DataFrame) -> DataFrame:
    """WITH FILL INTERPOLATE core over any ``(user_id, h, v)`` hourly
    DataFrame (one observation per hour at most)."""
    bounds = hourly.groupBy("user_id").agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
    )
    g = spine.join(hourly, ["user_id", "h"], "left").withColumn(
        "pos", (F.unix_timestamp("h") / 3600).cast("long")
    )
    back = (
        Window.partitionBy("user_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("pos")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    known_pos = F.when(F.col("v").isNotNull(), F.col("pos"))
    pval = F.last("v", ignorenulls=True).over(back)
    nval = F.first("v", ignorenulls=True).over(fwd)
    ppos = F.max(known_pos).over(back)
    npos = F.min(known_pos).over(fwd)
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(pval.isNull(), nval)
        .when(nval.isNull(), pval)
        .otherwise(
            pval
            + (nval - pval)
            * (F.col("pos") - ppos).cast("double")
            / (npos - ppos).cast("double")
        )
    )
    # NOT F.round: interpolation fractions (k/m for small m) times
    # low-decimal values land on exact .xxxx5 halves, where Spark
    # (decimal-string HALF_UP) and DuckDB (binary-exact) disagree.
    # floor(x*1e4 + 0.5)/1e4 is pure IEEE arithmetic — identical bits
    # on both engines, no tie policy involved.
    val4 = F.floor(interp * 10000 + F.lit(0.5)).cast("double") / 10000
    return g.select(
        "user_id",
        "h",
        F.col("v").isNull().cast("int").alias("gap"),
        val4.alias("val"),
    ).orderBy("user_id", "h")


_Q119_ORACLE = """
WITH e AS (SELECT * FROM events WHERE user_id < 10),
hourly AS (
  SELECT user_id, h, v FROM (
    SELECT user_id, date_trunc('hour', ts) AS h, value AS v,
           row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM e) t WHERE rn = 1),
bounds AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY user_id),
spine AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds),
g AS (
  SELECT s.user_id, s.h, v, CAST(epoch(s.h) / 3600 AS BIGINT) AS pos
  FROM spine s LEFT JOIN hourly USING (user_id, h)),
w AS (
  SELECT user_id, h, v, pos,
         last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pval,
         first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nval,
         max(CASE WHEN v IS NOT NULL THEN pos END) OVER (PARTITION BY user_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ppos,
         min(CASE WHEN v IS NOT NULL THEN pos END) OVER (PARTITION BY user_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS npos
  FROM g)
SELECT user_id, h, CAST(v IS NULL AS INT) AS gap,
       floor((CASE WHEN v IS NOT NULL THEN v
                   WHEN pval IS NULL THEN nval
                   WHEN nval IS NULL THEN pval
                   ELSE pval + (nval - pval) * (pos - ppos)::DOUBLE
                        / (npos - ppos)::DOUBLE END) * 10000 + 0.5) / 10000 AS val
FROM w ORDER BY user_id, h
"""


SPECS.extend(
    [
        QuerySpec(
            "q118_paste_join",
            "PASTE JOIN: positional zip of two bounded ordered result sets",
            _q118_paste_join,
            _Q118_ORACLE,
        ),
        QuerySpec(
            "q119_interpolate",
            "WITH FILL INTERPOLATE: linear interpolation over the hourly spine",
            _q119_interpolate,
            _Q119_ORACLE,
        ),
    ]
)


# ------------------------------------------- dialect shim under the gate

#: The ClickHouse-SQL text a reference user would type; the builder
#: runs it through functions/dialect.py and executes the translation.
_Q122_CLICKHOUSE_SQL = """
SELECT event_type,
       uniqExact(user_id)                    AS n_users,
       countIf(value > 50)                   AS n_big,
       round(sumIf(value, user_id % 2 = 0), 2) AS even_sum,
       round(avgIf(value, value > 0), 4)     AS pos_avg,
       toInt64(maxIf(user_id, value < 10))   AS m
FROM events
GROUP BY event_type
ORDER BY event_type
FORMAT JSONEachRow
"""


def _q122_dialect(spark: SparkSession, sf: str) -> DataFrame:
    """The ClickHouse dialect shim under the correctness gate: the
    query above is ClickHouse SQL verbatim (uniqExact / -If
    combinators / toInt64 / FORMAT clause); the builder translates it
    (functions/dialect.py) and executes the translation over the
    events view.  The oracle states the same semantics in portable
    SQL — so the gate checks the TRANSLATION, not just the plan."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(clickhouse_to_spark_sql(_Q122_CLICKHOUSE_SQL))


_Q122_ORACLE = """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(*) FILTER (value > 50) AS n_big,
       round(sum(CASE WHEN user_id % 2 = 0 THEN value END), 2) AS even_sum,
       round(avg(CASE WHEN value > 0 THEN value END), 4) AS pos_avg,
       CAST(max(CASE WHEN value < 10 THEN user_id END) AS BIGINT) AS m
FROM events
GROUP BY event_type
ORDER BY event_type
"""


SPECS.append(
    QuerySpec(
        "q122_clickhouse_dialect",
        "ClickHouse-SQL text executed via the dialect shim == portable SQL",
        _q122_dialect,
        _Q122_ORACLE,
    )
)


# ------------------------------- categoricalInformationValue / studentTTest

def _q123_cat_iv(spark: SparkSession, sf: str) -> DataFrame:
    """categoricalInformationValue(category, label): per-category
    weight of evidence ``ln((good_i/good)/(bad_i/bad))`` and the total
    information value — the standard categorical-predictiveness
    screen.  Label = (value > 50); category = event_type.  Cell counts
    pre-aggregate (|categories| rows cross the exchange); totals
    broadcast back."""
    e = load_table(spark, sf, "events").select(
        F.col("event_type").alias("cat"),
        (F.col("value") > 50).cast("int").alias("label"),
    )
    return cat_iv(e)


def cat_iv(labeled: DataFrame) -> DataFrame:
    """WoE/IV core over any ``(cat, label)`` DataFrame (binary label)."""
    cells = labeled.groupBy("cat").agg(
        F.sum("label").cast("double").alias("good"),
        F.sum(1 - F.col("label")).cast("double").alias("bad"),
    )
    tot = cells.agg(
        F.sum("good").alias("gt"), F.sum("bad").alias("bt")
    )
    j = cells.crossJoin(F.broadcast(tot))
    woe = F.log((F.col("good") / F.col("gt")) / (F.col("bad") / F.col("bt")))
    iv_term = ((F.col("good") / F.col("gt")) - (F.col("bad") / F.col("bt"))) * woe
    return (
        j.select(
            "cat",
            F.round(woe, 6).alias("woe"),
            F.round(iv_term, 6).alias("iv_term"),
        )
        .orderBy("cat")
    )


_Q123_ORACLE = """
WITH e AS (
  SELECT event_type AS cat, CAST(value > 50 AS INT) AS label FROM events),
cells AS (
  SELECT cat, sum(label)::DOUBLE AS good, sum(1 - label)::DOUBLE AS bad
  FROM e GROUP BY cat),
tot AS (SELECT sum(good) AS gt, sum(bad) AS bt FROM cells)
SELECT cat,
       round(ln((good / gt) / (bad / bt)), 6) AS woe,
       round(((good / gt) - (bad / bt)) * ln((good / gt) / (bad / bt)), 6) AS iv_term
FROM cells, tot ORDER BY cat
"""


def _q124_student_ttest(spark: SparkSession, sf: str) -> DataFrame:
    """studentTTest(value of 'click', value of 'purchase'): the
    pooled-variance two-sample t (vs q85's Welch form) — six algebraic
    moments, one aggregate pass."""
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
    df_ = F.col("n1") + F.col("n2") - 2
    sp2 = (
        (F.col("n1") - 1) * F.col("v1") + (F.col("n2") - 1) * F.col("v2")
    ) / df_
    t = (F.col("m1") - F.col("m2")) / F.sqrt(
        sp2 * (1 / F.col("n1") + 1 / F.col("n2"))
    )
    return j.select(
        F.round(t, 6).alias("t_stat"),
        df_.cast("long").alias("dof"),
    )


_Q124_ORACLE = """
WITH a AS (SELECT count(*)::DOUBLE n1, avg(value) m1, var_samp(value) v1
           FROM events WHERE event_type = 'click'),
b AS (SELECT count(*)::DOUBLE n2, avg(value) m2, var_samp(value) v2
      FROM events WHERE event_type = 'purchase')
SELECT round((m1 - m2) / sqrt((((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2))
             * (1 / n1 + 1 / n2)), 6) AS t_stat,
       CAST(n1 + n2 - 2 AS BIGINT) AS dof
FROM a, b
"""


SPECS.extend(
    [
        QuerySpec(
            "q123_cat_iv",
            "categoricalInformationValue: WoE + IV terms per category",
            _q123_cat_iv,
            _Q123_ORACLE,
        ),
        QuerySpec(
            "q124_student_ttest",
            "studentTTest: pooled-variance two-sample t statistic",
            _q124_student_ttest,
            _Q124_ORACLE,
        ),
    ]
)


# ------------------------------------------------- ngramSearch / ngramDistance

_NGRAM_QUERY = "green metallic"


def _q125_ngram_search(spark: SparkSession, sf: str) -> DataFrame:
    """ngramSearch-style fuzzy match: trigram-set Jaccard similarity of
    every part name against a fixed query string, top-20.

    The query's trigram set folds into the plan as a literal array; the
    per-row work is a narrow higher-order projection (trigram explode
    never happens — ``filter``/``size`` over the per-row array), so the
    scan streams at full speed and top-20 is a TakeOrdered.  ClickHouse
    normalizes by max set size (ngramDistance); Jaccard here —
    documented choice, identical on both engines."""
    q = _NGRAM_QUERY.lower()
    qgrams = sorted({q[i : i + 3] for i in range(len(q) - 2)})
    qlit = "array(" + ", ".join(f"'{g}'" for g in qgrams) + ")"
    p = load_table(spark, sf, "part")
    name = F.lower(F.col("p_name"))
    grams = (
        "array_distinct(transform(sequence(1, greatest(length({n}) - 2, 1)),"
        " i -> substring({n}, i, 3)))"
    ).format(n="lower(p_name)")
    inter = f"size(array_intersect({grams}, {qlit}))"
    uni = f"size(array_union({grams}, {qlit}))"
    return (
        p.select(
            "p_partkey",
            name.alias("name"),
            F.round(F.expr(f"{inter} / {uni}"), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), "p_partkey")
        .limit(20)
    )


def _q125_oracle() -> str:
    q = _NGRAM_QUERY.lower()
    qgrams = sorted({q[i : i + 3] for i in range(len(q) - 2)})
    qlit = "[" + ", ".join(f"'{g}'" for g in qgrams) + "]"
    grams = (
        "list_distinct(list_transform(range(1, greatest(length(lower(p_name)) - 1, 2)),"
        " i -> substr(lower(p_name), i, 3)))"
    )
    return f"""
SELECT p_partkey, lower(p_name) AS name,
       round(len(list_intersect({grams}, {qlit}))::DOUBLE
             / len(list_distinct(list_concat({grams}, {qlit})))::DOUBLE, 6) AS sim
FROM part
ORDER BY sim DESC, p_partkey LIMIT 20
"""


SPECS.append(
    QuerySpec(
        "q125_ngram_search",
        "ngramSearch: trigram-Jaccard fuzzy match vs a literal query, top-20",
        _q125_ngram_search,
        _q125_oracle(),
    )
)


# ------------------------------------------------------- regr_* family

def _q128_regr_family(spark: SparkSession, sf: str) -> DataFrame:
    """simpleLinearRegression / regr_* aggregate family via the
    BUILT-IN regression aggregates (Spark >= 3.4, identical in
    DuckDB): slope, intercept, r², counts — all algebraic moments,
    map-side partials (q76 builds the same from raw sums; this is the
    engine-native form)."""
    l = load_table(spark, sf, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
                "intercept"
            ),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
            F.regr_count("l_extendedprice", "l_quantity").alias("n"),
        )
        .orderBy("l_returnflag")
    )


_Q128_ORACLE = """
SELECT l_returnflag,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       regr_count(l_extendedprice, l_quantity) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


SPECS.append(
    QuerySpec(
        "q128_regr_family",
        "regr_slope/intercept/r2/count built-in regression aggregates",
        _q128_regr_family,
        _Q128_ORACLE,
    )
)


# --------------------------------------- quantileExactLow / quantileExactHigh

def _q126_quantile_exact_bounds(spark: SparkSession, sf: str) -> DataFrame:
    """quantileExactLow / quantileExactHigh(0.5) per return flag: the
    two exact order-statistic conventions (lower / upper of the
    straddling pair at rank (n-1)*q).  Ranks come from one window
    inside the group partition; the picked rows collapse with
    conditional min/max — no per-group collect, no second shuffle."""
    l = load_table(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_quantity").alias("v"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("rf").orderBy("v", "l_orderkey", "l_linenumber")
    ranked = l.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("rf"))
    )
    lo_rank = (F.floor((F.col("n") - 1) * 0.5) + 1).cast("long")
    hi_rank = (F.ceil((F.col("n") - 1) * 0.5) + 1).cast("long")
    return (
        ranked.groupBy("rf")
        .agg(
            F.min(F.when(F.col("rn") == lo_rank, F.col("v"))).alias("q50_low"),
            F.min(F.when(F.col("rn") == hi_rank, F.col("v"))).alias("q50_high"),
        )
        .orderBy("rf")
    )


_Q126_ORACLE = """
WITH ranked AS (
  SELECT l_returnflag AS rf, l_quantity AS v,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem)
SELECT rf,
       min(CASE WHEN rn = CAST(floor((n - 1) * 0.5) + 1 AS BIGINT) THEN v END) AS q50_low,
       min(CASE WHEN rn = CAST(ceil((n - 1) * 0.5) + 1 AS BIGINT) THEN v END) AS q50_high
FROM ranked GROUP BY rf ORDER BY rf
"""


SPECS.append(
    QuerySpec(
        "q126_quantile_exact_bounds",
        "quantileExactLow/High: straddling order statistics, one window",
        _q126_quantile_exact_bounds,
        _Q126_ORACLE,
    )
)


# ------------------------------------- sequenceMatch with time constraint

def _q127_sequence_match_timed(spark: SparkSession, sf: str) -> DataFrame:
    """sequenceMatch('(?1)(?t<600)(?2)') per user: a click followed by
    a purchase within 10 minutes.  One window per user partition — the
    running latest-click time; a purchase row matches when it falls
    inside the constraint window.  Counts matching users.

    Per-user state is one timestamp (the ClickHouse automaton state);
    the single exchange is the user partitioning."""
    e = load_table(spark, sf, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(w)
    flagged = e.withColumn(
        "hit",
        (
            (F.col("event_type") == "purchase")
            & last_click.isNotNull()
            & (
                F.unix_timestamp("ts") - F.unix_timestamp(last_click)
                < F.lit(600)
            )
        ).cast("int"),
    )
    return flagged.agg(
        F.count_distinct(F.when(F.col("hit") == 1, F.col("user_id"))).alias(
            "matched_users"
        )
    )


_Q127_ORACLE = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE event_type IN ('click', 'purchase')),
flagged AS (
  SELECT user_id, event_type, ts,
         max(CASE WHEN event_type = 'click' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click
  FROM e)
SELECT count(DISTINCT CASE WHEN event_type = 'purchase'
                            AND last_click IS NOT NULL
                            AND epoch(ts) - epoch(last_click) < 600
                           THEN user_id END) AS matched_users
FROM flagged
"""


SPECS.append(
    QuerySpec(
        "q127_sequence_match_timed",
        "sequenceMatch (?1)(?t<600)(?2): timed event chain per user",
        _q127_sequence_match_timed,
        _Q127_ORACLE,
    )
)


# ------------------------------------------------- runningConcurrency

def _q130_running_concurrency(spark: SparkSession, sf: str) -> DataFrame:
    """runningConcurrency(s, e): at every interval START, how many
    intervals are open — the per-event timeline maxIntersections
    (q112) reduces to its maximum.  Same endpoint sweep, filtered to
    the +1 events; first 200 of one key for a bounded result."""
    iv = _intervals(spark, sf).filter(F.col("k") == "O")
    pts = iv.select(
        "k", F.col("s").alias("pos"), F.lit(1).alias("delta"), F.col("oid")
    ).unionAll(
        iv.select("k", F.col("e").alias("pos"), F.lit(-1).alias("delta"),
                  F.col("oid"))
    )
    w = (
        Window.partitionBy("k")
        .orderBy("pos", "delta", "oid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = pts.withColumn("open", F.sum("delta").over(w))
    return (
        running.filter(F.col("delta") == 1)
        .select("pos", F.col("oid").alias("interval_id"), F.col("open").cast("int").alias("concurrency"))
        .orderBy("pos", "interval_id")
        .limit(200)
    )


_Q130_ORACLE = """
WITH iv AS (
  SELECT o_orderstatus AS k, o_orderkey AS oid,
         o_orderkey % 1000 AS s,
         o_orderkey % 1000 + o_custkey % 50 + 1 AS e
  FROM orders WHERE o_orderstatus = 'O'),
pts AS (
  SELECT k, s AS pos, 1 AS delta, oid FROM iv
  UNION ALL
  SELECT k, e AS pos, -1 AS delta, oid FROM iv),
running AS (
  SELECT pos, delta, oid,
         sum(delta) OVER (PARTITION BY k ORDER BY pos, delta, oid
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
  FROM pts)
SELECT pos, oid AS interval_id, CAST(open AS INT) AS concurrency
FROM running WHERE delta = 1
ORDER BY pos, interval_id LIMIT 200
"""


SPECS.append(
    QuerySpec(
        "q130_running_concurrency",
        "runningConcurrency: open-interval count at every interval start",
        _q130_running_concurrency,
        _Q130_ORACLE,
    )
)


# ----------------------------------------------- argMax / argMin / anyLast

#: ClickHouse SQL verbatim: argMax/argMin are the most-used ClickHouse
#: aggregates after sum/count (the "latest value per key" idiom every
#: sink table query leans on — reference README.md:29-52 workload).
_Q131_CLICKHOUSE_SQL = """
SELECT user_id,
       argMax(event_type, ts)            AS last_event,
       argMin(event_type, ts)            AS first_event,
       round(argMax(value, ts), 2)       AS last_value,
       toInt64(uniq(event_type))         AS type_cnt
FROM events
WHERE user_id < 20
GROUP BY user_id
ORDER BY user_id
"""


def _q131_argmax_dialect(spark: SparkSession, sf: str) -> DataFrame:
    """argMax/argMin through the dialect shim (-> max_by/min_by),
    oracle-gated like q122: the gate checks the TRANSLATION executes
    with ClickHouse semantics, not just that a hand-built plan does.
    Tie-safety: ``ts`` is unique per user in the fixture, so the
    arg-extremum is deterministic on both engines."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(clickhouse_to_spark_sql(_Q131_CLICKHOUSE_SQL))


_Q131_ORACLE = """
SELECT user_id,
       max_by(event_type, ts) AS last_event,
       min_by(event_type, ts) AS first_event,
       round(max_by(value, ts), 2) AS last_value,
       CAST(count(DISTINCT event_type) AS BIGINT) AS type_cnt
FROM events
WHERE user_id < 20
GROUP BY user_id
ORDER BY user_id
"""


SPECS.append(
    QuerySpec(
        "q131_argmax_dialect",
        "argMax/argMin via the dialect shim == max_by/min_by semantics",
        _q131_argmax_dialect,
        _Q131_ORACLE,
    )
)


# -------------------------------------- parameterized aggregates / FINAL

_Q132_CLICKHOUSE_SQL = """
SELECT event_type,
       round(quantileExact(0.5)(value), 6)           AS med,
       round(quantileExact(0.9)(value), 6)           AS p90,
       round(arrayElement(quantilesExact(0.25, 0.75)(value), 1), 6) AS p25,
       uniqExactIf(user_id, value > 100)             AS big_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def _q132_param_aggs(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse parameterized-aggregate syntax (``name(params)(args)``)
    through the dialect shim, oracle-gated: quantileExact ->
    percentile (exact linear interpolation, matching DuckDB's
    quantile_cont bit-for-bit on the same doubles), quantiles plural
    form -> array + element_at, uniqExactIf -> conditional exact
    count distinct."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(clickhouse_to_spark_sql(_Q132_CLICKHOUSE_SQL))


_Q132_ORACLE = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS med,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.25), 6) AS p25,
       count(DISTINCT CASE WHEN value > 100 THEN user_id END) AS big_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""


SPECS.append(
    QuerySpec(
        "q132_param_aggs",
        "Parameterized aggregates quantile(p)(x) via the dialect shim",
        _q132_param_aggs,
        _Q132_ORACLE,
    )
)


# -------------------------------------- LIMIT BY / WITH TOTALS via dialect

_Q134_CLICKHOUSE_SQL = """
SELECT user_id, event_id, round(value, 2) AS value
FROM events
ORDER BY value DESC, event_id
LIMIT 2 BY user_id
"""


def _q134_dialect_limit_by(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse ``LIMIT n BY col`` through the dialect shim: the
    translator restructures the query into a row_number window <= n
    over the wrapped base query (dialect._rewrite_limit_by), so the
    reference's per-group-top-n SQL (README.md:29-52 workload) runs
    unchanged.  Same plan shape as the hand-built q66_limit_by: one
    exchange on the group key, per-partition sort, no global sort
    before the filter."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    out = spark.sql(clickhouse_to_spark_sql(_Q134_CLICKHOUSE_SQL))
    # deterministic comparison order for the gate (ClickHouse returns
    # ORDER BY order; re-sorting does not change the row set)
    return out.orderBy("user_id", F.col("value").desc(), "event_id")


_Q134_ORACLE = """
SELECT user_id, event_id, round(value, 2) AS value
FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY round(value, 2) DESC, event_id) AS rn
  FROM events)
WHERE rn <= 2
ORDER BY user_id, value DESC, event_id
"""


SPECS.append(
    QuerySpec(
        "q134_dialect_limit_by",
        "LIMIT n BY through the dialect shim == row_number window",
        _q134_dialect_limit_by,
        _Q134_ORACLE,
    )
)


_Q135_CLICKHOUSE_SQL = """
SELECT event_type, count() AS n, round(sum(value), 2) AS total
FROM events
GROUP BY event_type WITH TOTALS
"""


def _q135_dialect_with_totals(spark: SparkSession, sf: str) -> DataFrame:
    """``GROUP BY ... WITH TOTALS`` through the dialect shim
    (dialect._rewrite_with_totals -> GROUPING SETS ((k), ())): the
    per-group rows plus exactly one grand-total row, keys NULL on the
    totals row.  Catalyst expands the two grouping sets map-side — one
    scan, one exchange, no second aggregation pass."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    out = spark.sql(clickhouse_to_spark_sql(_Q135_CLICKHOUSE_SQL))
    return out.orderBy(F.col("event_type").asc_nulls_last())


_Q135_ORACLE = """
SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
FROM events
GROUP BY GROUPING SETS ((event_type), ())
ORDER BY event_type NULLS LAST
"""


SPECS.append(
    QuerySpec(
        "q135_dialect_with_totals",
        "GROUP BY WITH TOTALS through the dialect shim == grouping sets",
        _q135_dialect_with_totals,
        _Q135_ORACLE,
    )
)


_Q136_CLICKHOUSE_SQL = """
SELECT user_id, event_id, round(value, 2) AS value
FROM events
ORDER BY value DESC, event_id
LIMIT 2 OFFSET 1 BY user_id
"""


def _q136_dialect_limit_offset_by(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse's ALTERNATE offset spelling ``LIMIT n OFFSET o BY``
    (operand order SWAPPED vs ``LIMIT o, n BY``) through the dialect
    shim: skip the best row per user, keep the next two.  Same
    row_number-window rewrite as q134 (dialect._rewrite_limit_by)."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    out = spark.sql(clickhouse_to_spark_sql(_Q136_CLICKHOUSE_SQL))
    return out.orderBy("user_id", F.col("value").desc(), "event_id")


_Q136_ORACLE = """
SELECT user_id, event_id, round(value, 2) AS value
FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY round(value, 2) DESC, event_id) AS rn
  FROM events)
WHERE rn > 1 AND rn <= 3
ORDER BY user_id, value DESC, event_id
"""


SPECS.append(
    QuerySpec(
        "q136_dialect_limit_offset_by",
        "LIMIT n OFFSET o BY (swapped-operand spelling) through the "
        "dialect shim == offset row_number window",
        _q136_dialect_limit_offset_by,
        _Q136_ORACLE,
    )
)


_Q137_CLICKHOUSE_SQL = """
SELECT user_id, count() AS n, round(sum(value), 2) AS total
FROM events
GROUP BY user_id WITH TOTALS
HAVING count() > 12
"""


def _q137_dialect_totals_having(spark: SparkSession, sf: str) -> DataFrame:
    """``WITH TOTALS ... HAVING`` through the dialect shim with
    ClickHouse's DEFAULT ``totals_mode='before_having'``: the totals
    row aggregates ALL rows (including the groups HAVING removes),
    translated as GROUPING SETS plus
    ``HAVING grouping(key) = 1 OR (cond)``
    (dialect._rewrite_with_totals)."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    out = spark.sql(clickhouse_to_spark_sql(_Q137_CLICKHOUSE_SQL))
    return out.orderBy(F.col("user_id").asc_nulls_last())


_Q137_ORACLE = """
SELECT user_id, count(*) AS n, round(sum(value), 2) AS total
FROM events
GROUP BY GROUPING SETS ((user_id), ())
HAVING grouping(user_id) = 1 OR count(*) > 12
ORDER BY user_id NULLS LAST
"""


SPECS.append(
    QuerySpec(
        "q137_dialect_totals_having",
        "WITH TOTALS + HAVING through the dialect shim: "
        "before_having totals semantics (ClickHouse default)",
        _q137_dialect_totals_having,
        _Q137_ORACLE,
    )
)


# --------------------------------------- round-5 dialect batch (2 of 2)

_Q138_CLICKHOUSE_SQL = """
SELECT toStartOfHour(ts) AS h,
       round(stddevPop(value), 6) AS sd,
       round(skewPop(value), 6) AS sk,
       round(kurtPop(value), 6) AS ku,
       count() AS n
FROM events
GROUP BY h
"""


def _q138_dialect_moments(spark: SparkSession, sf: str) -> DataFrame:
    """Population moment aggregates through the dialect shim:
    ``stddevPop``/``skewPop``/``kurtPop`` (skewPop == Spark's
    uncorrected ``skewness``; kurtPop = excess ``kurtosis`` + 3) over
    ``toStartOfHour`` groups.  The oracle computes the same moments
    from CENTERED sums (numerically stable — the raw-moment algebra
    cancels catastrophically at value³ magnitudes), rounded to 6
    decimals on both sides."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    out = spark.sql(clickhouse_to_spark_sql(_Q138_CLICKHOUSE_SQL))
    # normalize IEEE negative zero (round 12): a symmetric group's
    # third moment is numeric noise around 0 and DuckDB's round()
    # preserves -0.0 while Spark lands on +0.0 (seen at sf0.001, 48
    # rows).  x + 0.0 == x for every value EXCEPT -0.0 -> +0.0, so
    # this is a no-op wherever the engines already agreed (verified:
    # zero -0.0 rows at sf0.01/sf0.1); the oracle applies the same
    # normalization.
    out = out.select(
        "h",
        *[(F.col(c) + F.lit(0.0)).alias(c) for c in ("sd", "sk", "ku")],
        "n",
    )
    return out.orderBy("h")


_Q138_ORACLE = """
WITH g AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, value FROM events),
m AS (SELECT h, avg(value) AS mu FROM g GROUP BY h)
SELECT h,
       round(stddev_pop(value), 6) + 0.0 AS sd,
       round(CASE WHEN avg(pow(value - mu, 2)) <= 0 THEN NULL
                  ELSE avg(pow(value - mu, 3))
                       / pow(avg(pow(value - mu, 2)), 1.5) END, 6) + 0.0 AS sk,
       round(CASE WHEN avg(pow(value - mu, 2)) <= 0 THEN NULL
                  ELSE avg(pow(value - mu, 4))
                       / pow(avg(pow(value - mu, 2)), 2) END, 6) + 0.0 AS ku,
       count(*) AS n
FROM g JOIN m USING (h)
GROUP BY h ORDER BY h
"""


SPECS.append(
    QuerySpec(
        "q138_dialect_moments",
        "stddevPop/skewPop/kurtPop through the dialect shim == "
        "centered population moments",
        _q138_dialect_moments,
        _Q138_ORACLE,
    )
)


_Q139_CLICKHOUSE_SQL = """
SELECT event_id,
       dateDiff('hour', toMonday(ts), ts) AS hours_since_monday,
       dateDiff('day', toStartOfMonth(ts), toStartOfDay(ts)) AS day_in_month,
       arrayElement(arrayCumSum(arrayMap(x -> x + 1, [user_id % 5, event_id % 7, 2])), 3) AS cs3,
       arraySum(arrayDifference([user_id % 5, event_id % 7, 2])) AS span,
       arrayStringConcat(arrayMap(x -> toString(x), arrayCompact([user_id % 3, user_id % 3, event_id % 2])), ',') AS compacted,
       notEmpty([user_id]) AS ne
FROM events
WHERE event_id % 97 = 0
"""


def _q139_dialect_datetime_arrays(spark: SparkSession, sf: str) -> DataFrame:
    """Round-5 dialect batch through the shim: boundary-crossing
    ``dateDiff`` (ClickHouse counts crossed unit boundaries — the
    translation truncates both ends before ``timestampdiff``),
    ``toMonday``/``toStartOfMonth``/``toStartOfDay``, and the array
    family ``arrayCumSum``/``arrayDifference``/``arrayCompact``
    (+``arrayMap``/``arrayElement``/``arraySum``/``arrayStringConcat``
    compositions), reduced to scalar output columns."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    out = spark.sql(clickhouse_to_spark_sql(_Q139_CLICKHOUSE_SQL))
    return out.orderBy("event_id")


_Q139_ORACLE = """
SELECT event_id,
       datediff('hour', date_trunc('week', ts), ts) AS hours_since_monday,
       datediff('day', date_trunc('month', ts), date_trunc('day', ts)) AS day_in_month,
       CAST(list_sum(list_transform([user_id % 5, event_id % 7, 2],
                                    x -> CAST(x + 1 AS DOUBLE))) AS DOUBLE) AS cs3,
       CAST(2 - user_id % 5 AS DOUBLE) AS span,
       array_to_string(list_filter([user_id % 3, user_id % 3, event_id % 2],
                                   (x, i) -> i = 1 OR x != [user_id % 3, user_id % 3, event_id % 2][i - 1]),
                       ',') AS compacted,
       TRUE AS ne
FROM events
WHERE event_id % 97 = 0
ORDER BY event_id
"""


SPECS.append(
    QuerySpec(
        "q139_dialect_datetime_arrays",
        "dateDiff/toStartOf*/array-family batch through the dialect "
        "shim (boundary-crossing date diffs, cum-sum/difference/"
        "compact compositions)",
        _q139_dialect_datetime_arrays,
        _Q139_ORACLE,
    )
)


_Q140_CLICKHOUSE_SQL = """
SELECT event_type,
       round(medianExact(value), 6) AS med,
       transform(uniqExact(user_id) > 1000, [true, false], ['big', 'small'], '?') AS size_tier,
       intDiv(count(), 100) AS hundreds,
       modulo(count(), 97) AS m97
FROM events
GROUP BY event_type
"""


def _q140_dialect_mapping_batch(spark: SparkSession, sf: str) -> DataFrame:
    """Round-5 dialect batch, part 2: ClickHouse's value-mapping
    ``transform(x, [from], [to], default)`` (→ map_from_arrays
    lookup), ``medianExact`` (→ exact interpolated percentile, the
    quantileExact deviation documented in MIGRATION.md), ``intDiv``
    and ``modulo``."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    out = spark.sql(clickhouse_to_spark_sql(_Q140_CLICKHOUSE_SQL))
    return out.orderBy("event_type")


_Q140_ORACLE = """
SELECT event_type,
       round(median(value), 6) AS med,
       CASE WHEN (count(DISTINCT user_id) > 1000) = TRUE THEN 'big'
            WHEN (count(DISTINCT user_id) > 1000) = FALSE THEN 'small'
            ELSE '?' END AS size_tier,
       count(*) // 100 AS hundreds,
       count(*) % 97 AS m97
FROM events
GROUP BY event_type ORDER BY event_type
"""


SPECS.append(
    QuerySpec(
        "q140_dialect_mapping_batch",
        "transform value-mapping / medianExact / intDiv / modulo "
        "through the dialect shim",
        _q140_dialect_mapping_batch,
        _Q140_ORACLE,
    )
)


def _q141_variant_json(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured JSON via Spark 4's VARIANT type (ClickHouse
    ``JSON`` column-type parity): each event renders to a nested JSON
    document, parses to VARIANT (``parse_json``), and typed paths are
    extracted with ``variant_get`` — the engine's shredded
    binary-variant path, not string re-parsing per access.  At 100 TB
    VARIANT columns store the parsed binary form once; every
    ``variant_get`` is a direct path walk."""
    e = load_table(spark, sf, "events")
    docs = e.selectExpr(
        "parse_json(to_json(named_struct("
        "'u', user_id, "
        "'k', named_struct('t', event_type, 'vals', array(value, value * 2))"
        "))) AS v"
    )
    return (
        docs.selectExpr(
            "variant_get(v, '$.k.t', 'string') AS t",
            "variant_get(v, '$.k.vals[1]', 'double') AS second_val",
        )
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("second_val"), 2).alias("sv"),
        )
        .orderBy("t")
    )


_Q141_ORACLE = """
SELECT event_type AS t, count(*) AS n, round(sum(value * 2), 2) AS sv
FROM events GROUP BY t ORDER BY t
"""


SPECS.append(
    QuerySpec(
        "q141_variant_json",
        "Semi-structured JSON via VARIANT (parse_json + typed "
        "variant_get path extraction; ClickHouse JSON-type parity)",
        _q141_variant_json,
        _Q141_ORACLE,
    )
)


_Q142_CLICKHOUSE_SQL = """
SELECT CAST(floor(value) AS BIGINT) AS slot, count() AS n
FROM events
WHERE event_type = 'purchase' AND value < 30 AND user_id < 3
GROUP BY slot
ORDER BY slot WITH FILL FROM 0 TO 30
"""


def _q142_dialect_with_fill(spark: SparkSession, sf: str) -> DataFrame:
    """``ORDER BY ... WITH FILL FROM a TO b`` end-to-end: the modifier
    is lexically stripped (functions/fill.strip_with_fill), the
    remaining query goes through the dialect shim, and the fill rows
    are inserted structurally (apply_with_fill) with ClickHouse's
    type-default values (count columns fill as 0, not NULL) — the
    exact Engine.sql(dialect='clickhouse') path for the one clause a
    text-to-text translation cannot express."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )
    from substreams_sink_clickhouse_spark.functions.fill import (
        apply_with_fill,
        strip_with_fill,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    stripped, spec = strip_with_fill(_Q142_CLICKHOUSE_SQL)
    return apply_with_fill(spark.sql(clickhouse_to_spark_sql(stripped)), spec)


_Q142_ORACLE = """
WITH base AS (
  SELECT CAST(floor(value) AS BIGINT) AS slot, count(*) AS n
  FROM events
  WHERE event_type = 'purchase' AND value < 30 AND user_id < 3
  GROUP BY slot),
spine AS (SELECT unnest(range(0, 30)) AS g)
SELECT coalesce(slot, g) AS slot, coalesce(n, 0) AS n
FROM spine FULL JOIN base ON base.slot = spine.g
ORDER BY slot
"""


SPECS.append(
    QuerySpec(
        "q142_dialect_with_fill",
        "ORDER BY WITH FILL FROM/TO: structural gap fill, 0-defaults",
        _q142_dialect_with_fill,
        _Q142_ORACLE,
    )
)


_Q143_CLICKHOUSE_SQL = """
SELECT date_trunc('hour', ts) AS h, count() AS n
FROM events
WHERE event_type = 'purchase' AND ts < '2024-01-03'
GROUP BY h
ORDER BY h WITH FILL STEP INTERVAL 1 HOUR
"""


def _q143_with_fill_time(spark: SparkSession, sf: str) -> DataFrame:
    """WITH FILL over a timestamp spine with an INTERVAL step and no
    explicit bounds: gaps between observed hours fill per ClickHouse's
    row-anchored grid (prev + step while < next).  Fill values expand
    as JVM-side ``sequence()`` arrays over the DISTINCT hour set, so
    the neighbor scan is bounded by the output grid, not the input."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )
    from substreams_sink_clickhouse_spark.functions.fill import (
        apply_with_fill,
        strip_with_fill,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    stripped, spec = strip_with_fill(_Q143_CLICKHOUSE_SQL)
    return apply_with_fill(spark.sql(clickhouse_to_spark_sql(stripped)), spec)


_Q143_ORACLE = """
WITH base AS (
  SELECT date_trunc('hour', ts) AS h, count(*) AS n
  FROM events
  WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-03'
  GROUP BY h),
bounds AS (SELECT min(h) AS mn, max(h) AS mx FROM base),
spine AS (
  SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM bounds)
SELECT spine.h AS h, coalesce(n, 0) AS n
FROM spine LEFT JOIN base ON base.h = spine.h
ORDER BY h
"""


SPECS.append(
    QuerySpec(
        "q143_with_fill_time",
        "WITH FILL over a timestamp spine, INTERVAL step, no bounds",
        _q143_with_fill_time,
        _Q143_ORACLE,
    )
)


_Q144_CLICKHOUSE_SQL = """
SELECT event_type AS g, CAST(floor(value / 5) AS BIGINT) AS k,
       count() AS n, round(avg(value), 2) AS c
FROM events
WHERE user_id = 42 AND value < 100
GROUP BY g, k
ORDER BY g, k WITH FILL INTERPOLATE (c)
"""


def _q144_fill_grouped_interpolate(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped WITH FILL + carry-forward INTERPOLATE: preceding sort
    keys become fill groups (each group's spine fills independently,
    generated rows inherit the group value), the count column fills
    with its type default 0, and the INTERPOLATE column carries the
    previous actual row's value forward — ClickHouse's multi-column
    ORDER BY ... WITH FILL behavior in one entry.  The neighbor window
    partitions by group, so the fill scales with groups in parallel."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )
    from substreams_sink_clickhouse_spark.functions.fill import (
        apply_with_fill,
        strip_with_fill,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    stripped, spec = strip_with_fill(_Q144_CLICKHOUSE_SQL)
    return apply_with_fill(spark.sql(clickhouse_to_spark_sql(stripped)), spec)


_Q144_ORACLE = """
WITH base AS (
  SELECT event_type AS g, CAST(floor(value / 5) AS BIGINT) AS k,
         count(*) AS n, round(avg(value), 2) AS c
  FROM events
  WHERE user_id = 42 AND value < 100
  GROUP BY g, k),
bounds AS (SELECT g, min(k) AS mn, max(k) AS mx FROM base GROUP BY g),
spine AS (SELECT g, unnest(range(mn, mx + 1)) AS k FROM bounds),
joined AS (
  SELECT spine.g AS g, spine.k AS k, base.n AS n, base.c AS c
  FROM spine LEFT JOIN base ON base.g = spine.g AND base.k = spine.k)
SELECT g, k, coalesce(n, 0) AS n,
       coalesce(last_value(c IGNORE NULLS) OVER (
         PARTITION BY g ORDER BY k ROWS UNBOUNDED PRECEDING), 0.0) AS c
FROM joined
ORDER BY g, k
"""


SPECS.append(
    QuerySpec(
        "q144_fill_grouped_interpolate",
        "grouped WITH FILL + INTERPOLATE carry-forward, 0-default counts",
        _q144_fill_grouped_interpolate,
        _Q144_ORACLE,
    )
)


_Q146_CLICKHOUSE_SQL = """
SELECT toStartOfInterval(ts, INTERVAL 6 HOUR) AS bucket,
       count() AS n,
       arrayFold((acc, x) -> acc + CAST(round(x * 100) AS BIGINT),
                 groupArray(value), CAST(0 AS BIGINT)) AS cents,
       round(arrayFold((acc, x) -> greatest(acc, x), groupArray(value),
                       CAST(0 AS DOUBLE)), 2) AS mx
FROM events
GROUP BY bucket
"""


def _q146_dialect_fold_interval(spark: SparkSession, sf: str) -> DataFrame:
    """``toStartOfInterval(ts, INTERVAL 6 HOUR)`` (epoch-anchored
    bucket arithmetic) and ``arrayFold`` (operand-reordered to Spark's
    ``aggregate``) through the dialect shim.  The folds are chosen
    order-insensitive (integer cent sum, max) so the value hash is
    stable against collect_list ordering; the translation itself is
    what's under test."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(clickhouse_to_spark_sql(_Q146_CLICKHOUSE_SQL))


_Q146_ORACLE = """
SELECT make_timestamp(CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) * 1000000) AS bucket,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
       round(max(value), 2) AS mx
FROM events
GROUP BY bucket
"""


SPECS.append(
    QuerySpec(
        "q146_dialect_fold_interval",
        "toStartOfInterval + arrayFold through the dialect shim",
        _q146_dialect_fold_interval,
        _Q146_ORACLE,
    )
)


_SPARKBAR_GLYPHS = " ▁▂▃▄▅▆▇█"


def _q147_sparkbar(spark: SparkSession, sf: str) -> DataFrame:
    """``sparkbar(32)(day, value)`` per event_type: render each type's
    daily volume as a 32-char Unicode bar string (ClickHouse's inline
    chart aggregate, aggregate-functions/reference/sparkbar).

    Level mapping (documented; all INTEGER arithmetic so the engine
    and the oracle render byte-identical strings): x buckets by
    ``floor((x - min_x) * n / (max_x - min_x + 1))``, heights are
    per-bucket cent sums, a bucket maps to glyph
    ``ceil(8 * h / max_h)`` (1..8) or a space when empty.  One narrow
    aggregate keyed (series, bucket), then per-series assembly over a
    ``sequence(0, n-1)`` spine — map lookup + transform + concat, all
    JVM expressions; output is |series| rows."""
    n = 32
    ev = load_table(spark, sf, "events").select(
        F.col("event_type").alias("g"),
        (F.unix_timestamp("ts") / 86400).cast("long").alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    bounds = ev.groupBy("g").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    buckets = (
        ev.join(F.broadcast(bounds), "g")
        .withColumn(
            "b",
            ((F.col("x") - F.col("mn")) * n / (F.col("mx") - F.col("mn") + 1))
            .cast("long"),
        )
        .groupBy("g", "b")
        .agg(F.sum("cents").alias("h"))
    )
    per_series = buckets.groupBy("g").agg(
        F.map_from_entries(F.collect_list(F.struct("b", "h"))).alias("m"),
        F.max("h").alias("maxh"),
    )
    glyphs = ", ".join(f"'{c}'" for c in _SPARKBAR_GLYPHS)
    bar = F.expr(
        f"concat_ws('', transform(sequence(0, {n - 1}), i -> "
        f"element_at(array({glyphs}), CAST(CASE WHEN m[i] IS NULL OR m[i] <= 0 "
        f"THEN 0 ELSE (m[i] * 8 + maxh - 1) DIV maxh END AS INT) + 1)))"
    )
    return per_series.select("g", bar.alias("bar")).orderBy("g")


_Q147_ORACLE = """
WITH ev AS (
  SELECT event_type AS g,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS x,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
bounds AS (SELECT g, min(x) AS mn, max(x) AS mx FROM ev GROUP BY g),
buckets AS (
  SELECT ev.g AS g,
         CAST(floor((x - mn) * 32.0 / (mx - mn + 1)) AS BIGINT) AS b,
         sum(cents) AS h
  FROM ev JOIN bounds ON ev.g = bounds.g
  GROUP BY ev.g, CAST(floor((x - mn) * 32.0 / (mx - mn + 1)) AS BIGINT)),
stats AS (SELECT g, max(h) AS maxh FROM buckets GROUP BY g),
spine AS (
  SELECT stats.g AS g, i.i AS b, maxh
  FROM stats CROSS JOIN (SELECT unnest(range(0, 32)) AS i) i),
levels AS (
  SELECT spine.g AS g, spine.b AS b,
         CASE WHEN h IS NULL OR h <= 0 THEN 0
              ELSE CAST((h * 8 + maxh - 1) // maxh AS BIGINT) END AS lvl
  FROM spine LEFT JOIN buckets ON buckets.g = spine.g AND buckets.b = spine.b)
SELECT g, string_agg(chr(CAST(CASE WHEN lvl = 0 THEN 32 ELSE 9600 + lvl END AS INTEGER)), ''
                     ORDER BY b) AS bar
FROM levels
GROUP BY g
ORDER BY g
"""


SPECS.append(
    QuerySpec(
        "q147_sparkbar",
        "sparkbar inline bar-chart rendering, integer-exact levels",
        _q147_sparkbar,
        _Q147_ORACLE,
    )
)


def _q148_exp_moving_avg(spark: SparkSession, sf: str) -> DataFrame:
    """``exponentialMovingAverage(3600)(value, toUnixTimestamp(ts))``
    per user (ClickHouse's time-decay aggregate): each observation is
    weighted ``2^((t - t_latest) / halflife)`` so the newest point has
    weight 1 and a point one halflife older contributes half.  The
    sequential-looking recurrence has this closed form, so it runs as
    ONE algebraic aggregate after a per-key max — no window scan, no
    ordering dependence beyond the weights themselves; rounded (6dp)
    for hash stability across summation orders."""
    ev = load_table(spark, sf, "events").select(
        "user_id",
        F.col("value").alias("v"),
        F.unix_timestamp("ts").alias("t"),
    ).filter(F.col("user_id") < 10)
    latest = ev.groupBy("user_id").agg(F.max("t").alias("tmax"))
    w = F.pow(F.lit(2.0), (F.col("t") - F.col("tmax")) / F.lit(3600.0))
    return (
        ev.join(F.broadcast(latest), "user_id")
        .groupBy("user_id")
        .agg(
            F.round(F.sum(F.col("v") * w) / F.sum(w), 6).alias("ema")
        )
        .orderBy("user_id")
    )


_Q148_ORACLE = """
WITH ev AS (
  SELECT user_id, value AS v, CAST(floor(epoch(ts)) AS BIGINT) AS t
  FROM events WHERE user_id < 10),
latest AS (SELECT user_id, max(t) AS tmax FROM ev GROUP BY user_id)
SELECT ev.user_id AS user_id,
       round(sum(v * pow(2.0, (t - tmax) / 3600.0))
             / sum(pow(2.0, (t - tmax) / 3600.0)), 6) AS ema
FROM ev JOIN latest ON ev.user_id = latest.user_id
GROUP BY ev.user_id
ORDER BY user_id
"""


SPECS.append(
    QuerySpec(
        "q148_exp_moving_avg",
        "exponentialMovingAverage: closed-form time-decay aggregate",
        _q148_exp_moving_avg,
        _Q148_ORACLE,
    )
)


_Q149_CLICKHOUSE_SQL = """
SELECT event_id,
       arrayStringConcat(arrayPushBack(a, '99'), ',') AS pb,
       arrayStringConcat(arrayPushFront(a, '0'), ',') AS pf,
       arrayStringConcat(arrayPopBack(a), ',') AS pob,
       arrayStringConcat(arrayPopFront(a), ',') AS pof,
       arrayStringConcat(arrayRotateLeft(a, event_id), ',') AS rl,
       arrayStringConcat(arrayRotateRight(a, 2), ',') AS rr,
       arrayStringConcat(arrayResize(a, 7, '-1'), ',') AS rsz,
       arrayStringConcat(arrayShiftLeft(a, 2, '-1'), ',') AS sl,
       arrayStringConcat(arrayShiftRight(a, 2, '-1'), ',') AS sr
FROM (SELECT event_id,
             arrayMap(x -> toString(x + user_id), [1, 2, 3, 4, 5]) AS a
      FROM events WHERE event_id < 50) t
ORDER BY event_id
"""


def _q149_array_mutations(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse array-mutation family through the dialect shim:
    push/pop at both ends, modular rotation (arbitrary shift counts,
    pmod handles negatives), resize and shift with an explicit fill —
    each a slice/concat/array_repeat composition, row-local JVM
    expressions with no fan-out.  The 2-arg resize/shift forms raise
    (their pad value is the array TYPE's default, unknowable
    lexically)."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(clickhouse_to_spark_sql(_Q149_CLICKHOUSE_SQL))


_Q149_ORACLE = """
WITH base AS (
  SELECT event_id,
         list_transform(range(1, 6), x -> CAST(x + user_id AS VARCHAR)) AS a
  FROM events WHERE event_id < 50)
SELECT event_id,
       array_to_string(list_append(a, '99'), ',') AS pb,
       array_to_string(list_prepend('0', a), ',') AS pf,
       array_to_string(a[1:4], ',') AS pob,
       array_to_string(a[2:5], ',') AS pof,
       array_to_string(list_transform(range(1, 6),
         i -> a[CAST(((i - 1 + event_id % 5) % 5) + 1 AS BIGINT)]), ',') AS rl,
       array_to_string(list_transform(range(1, 6),
         i -> a[CAST(((i - 1 + 3) % 5) + 1 AS BIGINT)]), ',') AS rr,
       array_to_string(list_concat(a, ['-1', '-1']), ',') AS rsz,
       array_to_string(list_concat(a[3:5], ['-1', '-1']), ',') AS sl,
       array_to_string(list_concat(['-1', '-1'], a[1:3]), ',') AS sr
FROM base
ORDER BY event_id
"""


SPECS.append(
    QuerySpec(
        "q149_array_mutations",
        "array push/pop/rotate/resize/shift family through the shim",
        _q149_array_mutations,
        _Q149_ORACLE,
    )
)


_Q150_CLICKHOUSE_SQL = """
SELECT event_id,
       countSubstrings(props, '9') AS c9,
       positionCaseInsensitive(event_type, 'CLICK') AS pci,
       arrayStringConcat(splitByChar(':', props), '|') AS sp,
       concatWithSeparator('-', event_type, toString(user_id)) AS cw,
       startsWith(event_type, 'cl') AS sw,
       trimBoth('  pad  ') AS tb
FROM events
WHERE event_id < 100
ORDER BY event_id
"""


def _q150_string_batch2(spark: SparkSession, sf: str) -> DataFrame:
    """String family batch 2 through the dialect shim:
    ``countSubstrings`` (length arithmetic, no regex),
    ``positionCaseInsensitive``, ``splitByChar`` (literal separator
    regex-quoted with \\Q...\\E), ``concatWithSeparator``,
    ``startsWith``, ``trimBoth`` — all row-local JVM expressions."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(clickhouse_to_spark_sql(_Q150_CLICKHOUSE_SQL))


_Q150_ORACLE = """
SELECT event_id,
       CAST((length(props) - length(replace(props, '9', ''))) AS BIGINT) AS c9,
       instr(lower(event_type), lower('CLICK')) AS pci,
       array_to_string(string_split(props, ':'), '|') AS sp,
       concat_ws('-', event_type, CAST(user_id AS VARCHAR)) AS cw,
       starts_with(event_type, 'cl') AS sw,
       trim('  pad  ') AS tb
FROM events
WHERE event_id < 100
ORDER BY event_id
"""


SPECS.append(
    QuerySpec(
        "q150_string_batch2",
        "countSubstrings/positionCI/splitByChar/concat_ws through the shim",
        _q150_string_batch2,
        _Q150_ORACLE,
    )
)


_Q151_CLICKHOUSE_SQL = """
SELECT event_id,
       bitAnd(event_id, user_id) AS ba,
       bitOr(event_id, user_id) AS bo,
       bitXor(event_id, user_id) AS bx,
       bitNot(event_id) AS bn,
       bitShiftLeft(user_id, 3) AS bsl,
       bitShiftRight(event_id, 2) AS bsr,
       bitCount(event_id) AS bc
FROM events
WHERE event_id < 100
ORDER BY event_id
"""


def _q151_bit_scalars(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar bit-function family through the dialect shim: the binary
    ops map to Spark's native &/|/^ operators (whole-stage codegen),
    shifts to shiftleft/shiftright, population count to bit_count —
    integer-exact everywhere."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(clickhouse_to_spark_sql(_Q151_CLICKHOUSE_SQL))


_Q151_ORACLE = """
SELECT event_id,
       event_id & user_id AS ba,
       event_id | user_id AS bo,
       xor(event_id, user_id) AS bx,
       ~event_id AS bn,
       user_id << 3 AS bsl,
       event_id >> 2 AS bsr,
       bit_count(event_id) AS bc
FROM events
WHERE event_id < 100
ORDER BY event_id
"""


SPECS.append(
    QuerySpec(
        "q151_bit_scalars",
        "bitAnd/Or/Xor/Not, shifts, bitCount through the shim",
        _q151_bit_scalars,
        _Q151_ORACLE,
    )
)


def _q152_geohash(spark: SparkSession, sf: str) -> DataFrame:
    """``geohashEncode(lng, lat, 9)`` (ClickHouse geo bucketing) over
    each embedding's pseudo-coordinates (the q84 convention): 30-bit
    IEEE quantization, Morton interleave via the magic-number spread,
    base32 lookup — pure integer bit arithmetic after the initial
    floor, so both engines produce byte-identical hashes (verified
    against the canonical (57.64911, 10.40744) -> u4pruydqqvj test
    vector).  Map-only JVM expression; at scale this is the standard
    prefix-bucketing key for geo joins."""
    from substreams_sink_clickhouse_spark.functions.hashing import geohash_sql

    v = load_table(spark, sf, "embeddings")
    # explicit DOUBLE widening BEFORE arithmetic: DuckDB would otherwise
    # run the chain in float precision and quantize one ulp apart
    lat = "CAST(element_at(embedding, 1) AS DOUBLE) * 90.0"
    lng = "CAST(element_at(embedding, 2) AS DOUBLE) * 180.0"
    return (
        v.selectExpr(
            "vec_id",
            f"{geohash_sql(lat, lng, 9, 'spark')} AS gh",
        )
        .orderBy("vec_id")
        .limit(200)
    )


def _q152_oracle() -> str:
    from substreams_sink_clickhouse_spark.functions.hashing import geohash_sql

    lat = "CAST(embedding[1] AS DOUBLE) * 90.0"
    lng = "CAST(embedding[2] AS DOUBLE) * 180.0"
    return f"""
SELECT vec_id, {geohash_sql(lat, lng, 9, "duckdb")} AS gh
FROM embeddings
ORDER BY vec_id
LIMIT 200
"""


SPECS.append(
    QuerySpec(
        "q152_geohash",
        "geohashEncode: Morton-interleave base32, byte-identical hashes",
        _q152_geohash,
        _q152_oracle(),
    )
)


_Q153_CLICKHOUSE_SQL = """
SELECT event_id,
       arrayStringConcat(arraySort(arrayIntersect(a, b, c)), ',') AS ix,
       hasAll(a, b) AS hall,
       hasAny(a, c) AS hany
FROM (SELECT event_id,
             arrayMap(x -> x % 7, [event_id, event_id + 1, event_id + 2]) AS a,
             arrayMap(x -> x % 7, [event_id, event_id + 4]) AS b,
             [toInt64(3), toInt64(5)] AS c
      FROM events WHERE event_id < 100) t
ORDER BY event_id
"""


def _q153_array_predicates2(spark: SparkSession, sf: str) -> DataFrame:
    """n-ary ``arrayIntersect`` (left-folded ``array_intersect``),
    ``hasAll`` (empty ``array_except`` probe), ``hasAny``
    (``arrays_overlap``) through the dialect shim — row-local set
    predicates, the idiomatic pre-filter before an explode join."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(clickhouse_to_spark_sql(_Q153_CLICKHOUSE_SQL))


_Q153_ORACLE = """
WITH base AS (
  SELECT event_id,
         list_transform([event_id, event_id + 1, event_id + 2], x -> x % 7) AS a,
         list_transform([event_id, event_id + 4], x -> x % 7) AS b,
         [CAST(3 AS BIGINT), CAST(5 AS BIGINT)] AS c
  FROM events WHERE event_id < 100)
SELECT event_id,
       coalesce(array_to_string(list_sort(list_distinct(list_filter(a,
         x -> list_contains(b, x) AND list_contains(c, x)))), ','), '') AS ix,
       len(list_filter(b, x -> NOT list_contains(a, x))) = 0 AS hall,
       len(list_filter(c, x -> list_contains(a, x))) > 0 AS hany
FROM base
ORDER BY event_id
"""


SPECS.append(
    QuerySpec(
        "q153_array_predicates2",
        "n-ary arrayIntersect + hasAll/hasAny through the shim",
        _q153_array_predicates2,
        _Q153_ORACLE,
    )
)


def _q154_geohash_decode(spark: SparkSession, sf: str) -> DataFrame:
    """``geohashDecode``: cell-center recovery from the q152 hashes —
    char lookup -> 55-bit Morton -> magic-number bit COMPRESSION ->
    (q + 0.5)/2^k scaling.  Integer-exact until the last two FP ops,
    so both engines agree bitwise; the roundtrip error vs the original
    coordinates is bounded by the cell size (~1e-4 deg at 9 chars)."""
    from substreams_sink_clickhouse_spark.functions.hashing import (
        geohash_decode_sql,
        geohash_sql,
    )

    v = load_table(spark, sf, "embeddings")
    lat = "CAST(element_at(embedding, 1) AS DOUBLE) * 90.0"
    lng = "CAST(element_at(embedding, 2) AS DOUBLE) * 180.0"
    # decode expects 11 chars; encode at 11 here (q152 gates 9)
    gh = geohash_sql(lat, lng, 11, "spark")
    dlat, dlng = geohash_decode_sql(gh, "spark")
    return (
        v.selectExpr(
            "vec_id",
            f"round({dlat}, 7) AS lat_c",
            f"round({dlng}, 7) AS lng_c",
        )
        .orderBy("vec_id")
        .limit(200)
    )


def _q154_oracle() -> str:
    from substreams_sink_clickhouse_spark.functions.hashing import (
        geohash_decode_sql,
        geohash_sql,
    )

    lat = "CAST(embedding[1] AS DOUBLE) * 90.0"
    lng = "CAST(embedding[2] AS DOUBLE) * 180.0"
    gh = geohash_sql(lat, lng, 11, "duckdb")
    dlat, dlng = geohash_decode_sql(gh, "duckdb")
    return f"""
SELECT vec_id, round({dlat}, 7) AS lat_c, round({dlng}, 7) AS lng_c
FROM embeddings
ORDER BY vec_id
LIMIT 200
"""


SPECS.append(
    QuerySpec(
        "q154_geohash_decode",
        "geohashDecode: Morton compression back to cell centers",
        _q154_geohash_decode,
        _q154_oracle(),
    )
)


_Q155_CLICKHOUSE_SQL = """
SELECT event_id,
       arrayStringConcat(arraySort(mapKeys(m)), ',') AS ks,
       arrayStringConcat(arrayMap(x -> toString(x), arraySort(mapValues(m))), ',') AS vs,
       mapContains(m, 'a') AS hasa,
       mapContains(m, 'z') AS hasz
FROM (SELECT event_id, map('a', event_id % 3, 'b', event_id % 5) AS m
      FROM events WHERE event_id < 50) t
ORDER BY event_id
"""


def _q155_map_functions(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse map-function family through the dialect shim:
    ``map()`` constructor (same name/shape in Spark), ``mapKeys``/
    ``mapValues``/``mapContains`` name swaps — row-local expressions;
    the oracle reproduces the values with plain arithmetic so the
    translation is what's under test."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(clickhouse_to_spark_sql(_Q155_CLICKHOUSE_SQL))


_Q155_ORACLE = """
SELECT event_id,
       'a,b' AS ks,
       CAST(least(event_id % 3, event_id % 5) AS VARCHAR) || ',' ||
         CAST(greatest(event_id % 3, event_id % 5) AS VARCHAR) AS vs,
       true AS hasa,
       false AS hasz
FROM events
WHERE event_id < 50
ORDER BY event_id
"""


SPECS.append(
    QuerySpec(
        "q155_map_functions",
        "map()/mapKeys/mapValues/mapContains through the shim",
        _q155_map_functions,
        _Q155_ORACLE,
    )
)


_Q156_CLICKHOUSE_SQL = """
SELECT event_id,
       formatReadableSize(event_id * 131072 + user_id) AS sz,
       formatReadableQuantity(event_id * 1234 + user_id) AS qty
FROM events
WHERE event_id < 200
ORDER BY event_id
"""


def _q156_format_readable(spark: SparkSession, sf: str) -> DataFrame:
    """``formatReadableSize``/``formatReadableQuantity`` through the
    shim: unit selection by magnitude plus deterministic 2dp HALF-UP
    rendering via integer arithmetic (printf %.2f would tie-round
    differently across engines — Java HALF_UP vs C half-even)."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(clickhouse_to_spark_sql(_Q156_CLICKHOUSE_SQL))


def _fmt_oracle(x: str, base: float, units: list[str], sep: str) -> str:
    whens = []
    for k, u in enumerate(units):
        div = base**k
        cents = f"CAST(floor(abs(CAST({x} AS DOUBLE)) / {div} * 100.0 + 0.5) AS BIGINT)"
        rendered = (
            f"concat(CASE WHEN ({x}) < 0 THEN '-' ELSE '' END, "
            f"CAST({cents} // 100 AS VARCHAR), '.', "
            f"lpad(CAST({cents} % 100 AS VARCHAR), 2, '0'), '{sep}{u}')"
        )
        if k < len(units) - 1:
            whens.append(f"WHEN abs(CAST({x} AS DOUBLE)) < {base ** (k + 1)} THEN {rendered}")
        else:
            whens.append(f"ELSE {rendered}")
    return "(CASE " + " ".join(whens) + " END)"


def _q156_oracle() -> str:
    sz = _fmt_oracle(
        "event_id * 131072 + user_id", 1024.0,
        ["B", "KiB", "MiB", "GiB", "TiB", "PiB", "EiB"], " ",
    )
    qty = _fmt_oracle(
        "event_id * 1234 + user_id", 1000.0,
        ["", " thousand", " million", " billion", " trillion"], "",
    )
    return f"""
SELECT event_id, {sz} AS sz, {qty} AS qty
FROM events
WHERE event_id < 200
ORDER BY event_id
"""


SPECS.append(
    QuerySpec(
        "q156_format_readable",
        "formatReadableSize/Quantity: integer-exact 2dp rendering",
        _q156_format_readable,
        _q156_oracle(),
    )
)


_Q157_CLICKHOUSE_SQL = """
SELECT event_id,
       toYear(ts) AS y, toQuarter(ts) AS q, toMonth(ts) AS mo,
       toDayOfMonth(ts) AS dom, toDayOfYear(ts) AS doy,
       toDayOfWeek(ts) AS dow,
       toHour(ts) AS h, toMinute(ts) AS mi, toSecond(ts) AS sec,
       toYYYYMMDD(ts) AS ymd,
       toRelativeHourNum(ts) AS rh, toRelativeDayNum(ts) AS rd
FROM events
WHERE event_id < 200
ORDER BY event_id
"""


def _q157_datetime_accessors(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse datetime accessor family through the shim: direct
    name swaps except ``toDayOfWeek`` (Monday-first wrap over Spark's
    weekday()) and the epoch-division ``toRelative*Num`` forms."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(clickhouse_to_spark_sql(_Q157_CLICKHOUSE_SQL))


_Q157_ORACLE = """
SELECT event_id,
       year(ts) AS y, quarter(ts) AS q, month(ts) AS mo,
       dayofmonth(ts) AS dom, dayofyear(ts) AS doy,
       isodow(ts) AS dow,
       hour(ts) AS h, minute(ts) AS mi, second(ts) AS sec,
       CAST(strftime(ts, '%Y%m%d') AS INT) AS ymd,
       CAST(floor(floor(epoch(ts)) / 3600) AS BIGINT) AS rh,
       CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS rd
FROM events
WHERE event_id < 200
ORDER BY event_id
"""


SPECS.append(
    QuerySpec(
        "q157_datetime_accessors",
        "toYear..toSecond/toDayOfWeek/toYYYYMMDD/toRelative*Num",
        _q157_datetime_accessors,
        _Q157_ORACLE,
    )
)


_Q158_CLICKHOUSE_SQL = """
SELECT event_id,
       addDays(ts, 3) AS d3,
       addMonths(ts, 2) AS m2,
       addHours(ts, 5) AS h5,
       subtractMinutes(ts, 90) AS m90,
       subtractYears(ts, 1) AS y1,
       toLastDayOfMonth(ts) AS eom
FROM events
WHERE event_id < 200
ORDER BY event_id
"""


def _q158_date_arithmetic(spark: SparkSession, sf: str) -> DataFrame:
    """``add<Unit>``/``subtract<Unit>`` date arithmetic through the
    shim — all map to Spark's ``timestampadd`` (negative amounts for
    the subtract forms), plus ``toLastDayOfMonth`` -> ``last_day``."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(clickhouse_to_spark_sql(_Q158_CLICKHOUSE_SQL))


_Q158_ORACLE = """
SELECT event_id,
       ts + INTERVAL 3 DAY AS d3,
       ts + INTERVAL 2 MONTH AS m2,
       ts + INTERVAL 5 HOUR AS h5,
       ts - INTERVAL 90 MINUTE AS m90,
       ts - INTERVAL 1 YEAR AS y1,
       CAST(last_day(ts) AS DATE) AS eom
FROM events
WHERE event_id < 200
ORDER BY event_id
"""


SPECS.append(
    QuerySpec(
        "q158_date_arithmetic",
        "add/subtract<Unit> -> timestampadd; toLastDayOfMonth",
        _q158_date_arithmetic,
        _Q158_ORACLE,
    )
)


_Q159_CLICKHOUSE_SQL = """
SELECT event_id,
       JSONExtractInt(props, 'k') AS ki,
       JSONExtractString(props, 'k') AS ks,
       JSONHas(props, 'k') AS hk,
       JSONHas(props, 'missing') AS hm,
       arrayStringConcat(JSONExtractKeys(props), ',') AS keys,
       JSONLength(props) AS n,
       isValidJSON(props) AS ok
FROM events
WHERE event_id < 200
ORDER BY event_id
"""


def _q159_json_functions(spark: SparkSession, sf: str) -> DataFrame:
    """JSON introspection family through the dialect shim: the typed
    JSONExtract* forms build a get_json_object path from the key
    arguments (nested keys chain as '$.a.b'), JSONExtractKeys maps to
    json_object_keys, JSONLength covers arrays AND objects."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(clickhouse_to_spark_sql(_Q159_CLICKHOUSE_SQL))


_Q159_ORACLE = """
SELECT event_id,
       CAST(props ->> '$.k' AS BIGINT) AS ki,
       CAST(props ->> '$.k' AS VARCHAR) AS ks,
       props ->> '$.k' IS NOT NULL AS hk,
       props ->> '$.missing' IS NOT NULL AS hm,
       array_to_string(json_keys(props), ',') AS keys,
       len(json_keys(props)) AS n,
       true AS ok
FROM events
WHERE event_id < 200
ORDER BY event_id
"""


SPECS.append(
    QuerySpec(
        "q159_json_functions",
        "JSONExtract*/JSONHas/Keys/Length/isValidJSON through the shim",
        _q159_json_functions,
        _Q159_ORACLE,
    )
)


_Q160_URL = (
    "concat('https://www.', event_type, '.example.com/p/',"
    " toString(user_id), '?uid=', toString(user_id), '#sec',"
    " toString(event_id % 5))"
)

_Q160_CLICKHOUSE_SQL = f"""
SELECT event_id,
       cutQueryString({_Q160_URL}) AS cq,
       cutFragment({_Q160_URL}) AS cf,
       cutQueryStringAndFragment({_Q160_URL}) AS cqf,
       queryString({_Q160_URL}) AS qs,
       fragment({_Q160_URL}) AS fr,
       domainWithoutWWW({_Q160_URL}) AS dom,
       protocol({_Q160_URL}) AS proto,
       decodeURLComponent('a%20b%2Fc') AS dec
FROM events
WHERE event_id < 200
ORDER BY event_id
"""


def _q160_url_batch2(spark: SparkSession, sf: str) -> DataFrame:
    """URL family batch 2 through the dialect shim: the cut* trio
    (substring_index compositions), queryString/fragment/protocol
    (parse_url with ClickHouse's empty-string-when-absent contract),
    domainWithoutWWW, decodeURLComponent -> url_decode."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(clickhouse_to_spark_sql(_Q160_CLICKHOUSE_SQL))


_Q160_DUCK_URL = (
    "concat('https://www.', event_type, '.example.com/p/',"
    " CAST(user_id AS VARCHAR), '?uid=', CAST(user_id AS VARCHAR), '#sec',"
    " CAST(event_id % 5 AS VARCHAR))"
)

_Q160_ORACLE = f"""
SELECT event_id,
       split_part({_Q160_DUCK_URL}, '?', 1) AS cq,
       split_part({_Q160_DUCK_URL}, '#', 1) AS cf,
       split_part(split_part({_Q160_DUCK_URL}, '#', 1), '?', 1) AS cqf,
       split_part(split_part({_Q160_DUCK_URL}, '#', 1), '?', 2) AS qs,
       split_part({_Q160_DUCK_URL}, '#', 2) AS fr,
       replace(split_part(split_part({_Q160_DUCK_URL}, '//', 2), '/', 1),
               'www.', '') AS dom,
       'https' AS proto,
       'a b/c' AS dec
FROM events
WHERE event_id < 200
ORDER BY event_id
"""


SPECS.append(
    QuerySpec(
        "q160_url_batch2",
        "cut*/queryString/fragment/domainWithoutWWW/protocol/url_decode",
        _q160_url_batch2,
        _Q160_ORACLE,
    )
)


_Q161_CLICKHOUSE_SQL = """
SELECT vec_id,
       round(L2Distance(e, r), 6) AS l2,
       round(arrayDotProduct(e, r), 6) AS dot,
       round(cosineDistance(e, r), 6) AS cosd,
       round(L1Distance(e, r), 6) AS l1,
       round(LinfDistance(e, r), 6) AS linf
FROM (SELECT vec_id, embedding AS e, arrayReverse(embedding) AS r
      FROM embeddings) t
ORDER BY vec_id
LIMIT 300
"""


def _q161_vector_distances(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse vector-distance family through the dialect shim —
    ``L1/L2/L2Squared/Linf/cosineDistance`` and ``arrayDotProduct``
    expand to JVM ``zip_with``/``aggregate`` folds (double-widened per
    element), here over each embedding against its own reversal so the
    entry is row-local.  These are the scalar legs the ANN operators
    (sim_*) build on."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "embeddings").createOrReplaceTempView("embeddings")
    return spark.sql(clickhouse_to_spark_sql(_Q161_CLICKHOUSE_SQL))


_Q161_ORACLE = """
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings)
SELECT vec_id,
       round(sqrt(list_sum(list_transform(range(1, 65),
         i -> (e[i] - e[65 - i]) * (e[i] - e[65 - i])))), 6) AS l2,
       round(list_sum(list_transform(range(1, 65),
         i -> e[i] * e[65 - i])), 6) AS dot,
       round(1.0 - list_sum(list_transform(range(1, 65),
         i -> e[i] * e[65 - i]))
         / (sqrt(list_sum(list_transform(range(1, 65), i -> e[i] * e[i])))
            * sqrt(list_sum(list_transform(range(1, 65), i -> e[i] * e[i])))),
         6) AS cosd,
       round(list_sum(list_transform(range(1, 65),
         i -> abs(e[i] - e[65 - i]))), 6) AS l1,
       round(list_max(list_transform(range(1, 65),
         i -> abs(e[i] - e[65 - i]))), 6) AS linf
FROM base
ORDER BY vec_id
LIMIT 300
"""


SPECS.append(
    QuerySpec(
        "q161_vector_distances",
        "L1/L2/Linf/cosine distances + dot product through the shim",
        _q161_vector_distances,
        _Q161_ORACLE,
    )
)


def geo_radius_join(
    points: DataFrame,
    probes: list[tuple[int, float, float]],
    radius_km: float,
    lat_col: str = "lat",
    lng_col: str = "lng",
    precision: int = 4,
) -> DataFrame:
    """Radius join via geohash prefix bucketing: each (small) probe
    expands to its 3x3 neighbor cells at ``precision`` (encoded by
    offsetting the probe +-radius in each axis), candidates match on
    the cell prefix with a hash join, and haversine refines exactly.

    The 100 TB shape: the big point side is bucketed by a map-only
    geohash expression (functions/hashing.py) and joined against a
    broadcast probe-cell list — never a cross join.  Requires
    |probe lat| + the radius to stay below ~60 degrees so a precision-4
    cell (>=19 km on both axes there) covers the radius; callers with
    polar probes must raise the precision budget (cells halve per
    2.5 chars).

    ``probes``: [(probe_id, lat, lng)] — driver-small by contract.
    """
    from substreams_sink_clickhouse_spark.functions.hashing import geohash_sql

    spark = points.sparkSession
    if radius_km > 15 or any(abs(la) > 60 for _, la, _ in probes):
        raise ValueError(
            "precision-4 cells only cover <=15 km radii below 60 deg "
            "latitude; raise precision for tighter grids"
        )
    rows = []
    for pid, la, lo in probes:
        dlat = radius_km / 111.0
        dlng = radius_km / (111.0 * max(0.2, __import__("math").cos(__import__("math").radians(abs(la) + dlat))))
        for oy in (-dlat, 0.0, dlat):
            for ox in (-dlng, 0.0, dlng):
                rows.append((pid, la, lo, la + oy, lo + ox))
    cells = spark.createDataFrame(
        rows, "probe_id long, plat double, plng double, clat double, clng double"
    ).selectExpr(
        "probe_id", "plat", "plng",
        f"{geohash_sql('clat', 'clng', precision, 'spark')} AS cell",
    ).dropDuplicates(["probe_id", "cell"])
    pts = points.selectExpr(
        "*", f"{geohash_sql(lat_col, lng_col, precision, 'spark')} AS cell"
    )
    hav = (
        "2.0 * 6371.0 * asin(sqrt(pow(sin(radians(plat - {lat}) / 2), 2) "
        "+ cos(radians(plat)) * cos(radians({lat})) "
        "* pow(sin(radians(plng - {lng}) / 2), 2)))"
    ).format(lat=lat_col, lng=lng_col)
    return (
        pts.join(F.broadcast(cells), "cell")
        .where(F.expr(hav) <= radius_km)
        .drop("cell", "plat", "plng")
    )


#: probes inside the synthetic cluster (see _q162: coordinates
#: concentrate around Paris so a 12 km radius actually selects)
_Q162_PROBES = [
    (1, 48.8566, 2.3522),
    (2, 48.70, 2.10),
    (3, 49.05, 2.60),
]


def _q162_geo_radius_join(spark: SparkSession, sf: str) -> DataFrame:
    """Geohash-bucketed radius join (see :func:`geo_radius_join`)
    between the embeddings' pseudo-coordinates and 5 probe cities at
    12 km: prefix-bucket candidates + exact haversine refine — the
    oracle brute-forces the same haversine over the full cross space,
    so the gate proves the bucketing loses no matches."""
    # pseudo-coordinates clustered ~+-55 km around Paris so the gate
    # exercises non-empty candidate buckets AND empty ones
    pts = load_table(spark, sf, "embeddings").selectExpr(
        "vec_id",
        "48.8566 + CAST(element_at(embedding, 1) AS DOUBLE) * 2.0 AS lat",
        "2.3522 + CAST(element_at(embedding, 2) AS DOUBLE) * 3.0 AS lng",
    )
    out = geo_radius_join(pts, _Q162_PROBES, 12.0)
    return out.select("probe_id", "vec_id").orderBy("probe_id", "vec_id")


_Q162_ORACLE = """
WITH pts AS (
  SELECT vec_id,
         48.8566 + CAST(embedding[1] AS DOUBLE) * 2.0 AS lat,
         2.3522 + CAST(embedding[2] AS DOUBLE) * 3.0 AS lng
  FROM embeddings),
probes(probe_id, plat, plng) AS (VALUES
  (1, 48.8566, 2.3522), (2, 48.70, 2.10), (3, 49.05, 2.60))
SELECT probe_id, vec_id
FROM probes, pts
WHERE 2.0 * 6371.0 * asin(sqrt(pow(sin(radians(plat - lat) / 2), 2)
      + cos(radians(plat)) * cos(radians(lat))
      * pow(sin(radians(plng - lng) / 2), 2))) <= 12.0
ORDER BY probe_id, vec_id
"""


SPECS.append(
    QuerySpec(
        "q162_geo_radius_join",
        "geohash-bucketed radius join: prefix candidates + haversine",
        _q162_geo_radius_join,
        _Q162_ORACLE,
    )
)


_Q163_CLICKHOUSE_SQL = """
SELECT event_id,
       regexpExtract(props, '"k": ([0-9]+)') AS knum,
       countMatches(props, '[0-9]') AS digits,
       arrayStringConcat(splitByRegexp('[:,]', props), '|') AS parts,
       tupleElement(tuple(event_type, user_id), 1) AS t1,
       tupleElement(tuple(event_type, user_id), 2) AS t2
FROM events
WHERE event_id < 200
ORDER BY event_id
"""


def _q163_regex_tuple(spark: SparkSession, sf: str) -> DataFrame:
    """regexpExtract (ClickHouse's default group 1), countMatches,
    splitByRegexp, and tuple/tupleElement (named_struct with forced
    colN fields so positional access resolves for any operand shape)
    through the dialect shim."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(clickhouse_to_spark_sql(_Q163_CLICKHOUSE_SQL))


_Q163_ORACLE = """
SELECT event_id,
       coalesce(regexp_extract(props, '"k": ([0-9]+)', 1), '') AS knum,
       len(regexp_extract_all(props, '[0-9]', 0)) AS digits,
       array_to_string(string_split_regex(props, '[:,]'), '|') AS parts,
       event_type AS t1,
       user_id AS t2
FROM events
WHERE event_id < 200
ORDER BY event_id
"""


SPECS.append(
    QuerySpec(
        "q163_regex_tuple",
        "regexpExtract/countMatches/splitByRegexp/tupleElement",
        _q163_regex_tuple,
        _Q163_ORACLE,
    )
)


def _q164_geohashes_in_box(spark: SparkSession, sf: str) -> DataFrame:
    """``geohashesInBox``: per-row 0.2-degree boxes around each
    embedding's pseudo-coordinate enumerate their precision-4 cells —
    quantized index ranges + JVM sequence/transform re-encoding each
    cell center (functions/hashing.geohashes_in_box_sql).  This is the
    coarse-candidate enumeration leg of geo queries (the radius join's
    box-cover generalization)."""
    from substreams_sink_clickhouse_spark.functions.hashing import (
        geohashes_in_box_sql,
    )

    v = load_table(spark, sf, "embeddings")
    box = geohashes_in_box_sql(
        "lng0", "lat0", "lng0 + 0.2", "lat0 + 0.2", 4, "spark"
    )
    return (
        v.selectExpr(
            "vec_id",
            "48.0 + CAST(element_at(embedding, 1) AS DOUBLE) * 2.0 AS lat0",
            "2.0 + CAST(element_at(embedding, 2) AS DOUBLE) * 3.0 AS lng0",
        )
        .selectExpr(
            "vec_id",
            f"array_join(array_sort({box}), ',') AS cells",
        )
        .orderBy("vec_id")
        .limit(200)
    )


def _q164_oracle() -> str:
    from substreams_sink_clickhouse_spark.functions.hashing import (
        geohashes_in_box_sql,
    )

    box = geohashes_in_box_sql(
        "lng0", "lat0", "lng0 + 0.2", "lat0 + 0.2", 4, "duckdb"
    )
    return f"""
WITH base AS (
  SELECT vec_id,
         48.0 + CAST(embedding[1] AS DOUBLE) * 2.0 AS lat0,
         2.0 + CAST(embedding[2] AS DOUBLE) * 3.0 AS lng0
  FROM embeddings)
SELECT vec_id, array_to_string(list_sort({box}), ',') AS cells
FROM base
ORDER BY vec_id
LIMIT 200
"""


SPECS.append(
    QuerySpec(
        "q164_geohashes_in_box",
        "geohashesInBox: quantized index ranges -> cell enumeration",
        _q164_geohashes_in_box,
        _q164_oracle(),
    )
)


#: pentagon around the synthetic Paris cluster (q162's coordinates)
_Q165_POLY = [
    (1.5, 48.3), (3.2, 48.5), (3.4, 49.4), (2.3, 49.8), (1.2, 49.2),
]


def _q165_point_in_polygon(spark: SparkSession, sf: str) -> DataFrame:
    """``pointInPolygon`` (literal pentagon, even-odd ray casting as a
    filter-count over the edge array — functions/hashing.
    point_in_polygon_sql): one boolean JVM expression per row,
    identical IEEE formula on both engines."""
    from substreams_sink_clickhouse_spark.functions.hashing import (
        point_in_polygon_sql,
    )

    pred = point_in_polygon_sql("lng0", "lat0", _Q165_POLY, "spark")
    return (
        load_table(spark, sf, "embeddings")
        .selectExpr(
            "vec_id",
            "48.8566 + CAST(element_at(embedding, 1) AS DOUBLE) * 2.0 AS lat0",
            "2.3522 + CAST(element_at(embedding, 2) AS DOUBLE) * 3.0 AS lng0",
        )
        .selectExpr("vec_id", f"{pred} AS inside")
        .orderBy("vec_id")
        .limit(300)
    )


def _q165_oracle() -> str:
    from substreams_sink_clickhouse_spark.functions.hashing import (
        point_in_polygon_sql,
    )

    pred = point_in_polygon_sql("lng0", "lat0", _Q165_POLY, "duckdb")
    return f"""
WITH base AS (
  SELECT vec_id,
         48.8566 + CAST(embedding[1] AS DOUBLE) * 2.0 AS lat0,
         2.3522 + CAST(embedding[2] AS DOUBLE) * 3.0 AS lng0
  FROM embeddings)
SELECT vec_id, {pred} AS inside
FROM base
ORDER BY vec_id
LIMIT 300
"""


SPECS.append(
    QuerySpec(
        "q165_point_in_polygon",
        "pointInPolygon: even-odd ray casting over a literal pentagon",
        _q165_point_in_polygon,
        _q165_oracle(),
    )
)


_Q166_CLICKHOUSE_SQL = """
SELECT event_id,
       monthName(ts) AS mname,
       toISOWeek(ts) AS iw,
       toISOYear(ts) AS iy,
       toStartOfFifteenMinutes(ts) AS q15,
       timeSlot(ts) AS slot
FROM events
WHERE event_id < 200
ORDER BY event_id
"""


def _q166_iso_time(spark: SparkSession, sf: str) -> DataFrame:
    """ISO week/year accessors, English month names, and the
    fixed-width epoch floors (five/ten/fifteen-minute starts,
    ClickHouse's 30-minute ``timeSlot``) through the dialect shim."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(clickhouse_to_spark_sql(_Q166_CLICKHOUSE_SQL))


_Q166_ORACLE = """
SELECT event_id,
       monthname(ts) AS mname,
       CAST(weekofyear(ts) AS INT) AS iw,
       CAST(isoyear(ts) AS INT) AS iy,
       make_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) * 1000000) AS q15,
       make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) * 1000000) AS slot
FROM events
WHERE event_id < 200
ORDER BY event_id
"""


SPECS.append(
    QuerySpec(
        "q166_iso_time",
        "monthName/toISOWeek/toISOYear/timeSlot/fifteen-minute floors",
        _q166_iso_time,
        _Q166_ORACLE,
    )
)


_Q167_CLICKHOUSE_SQL = """
SELECT event_id,
       IPv4NumToString(event_id * 65793 + user_id) AS ip,
       IPv4StringToNum(IPv4NumToString(event_id * 65793 + user_id)) AS back
FROM events
WHERE event_id < 300
ORDER BY event_id
"""


def _q167_ipv4_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """``IPv4NumToString``/``IPv4StringToNum`` through the shim —
    integer octet arithmetic both ways, proven by the roundtrip column
    equaling the input."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(clickhouse_to_spark_sql(_Q167_CLICKHOUSE_SQL))


_Q167_ORACLE = """
SELECT event_id,
       concat(CAST((event_id * 65793 + user_id) // 16777216 AS VARCHAR), '.',
              CAST(((event_id * 65793 + user_id) // 65536) % 256 AS VARCHAR), '.',
              CAST(((event_id * 65793 + user_id) // 256) % 256 AS VARCHAR), '.',
              CAST((event_id * 65793 + user_id) % 256 AS VARCHAR)) AS ip,
       event_id * 65793 + user_id AS back
FROM events
WHERE event_id < 300
ORDER BY event_id
"""


SPECS.append(
    QuerySpec(
        "q167_ipv4_roundtrip",
        "IPv4NumToString/StringToNum octet arithmetic roundtrip",
        _q167_ipv4_roundtrip,
        _Q167_ORACLE,
    )
)


_Q168_CLICKHOUSE_SQL = """
SELECT event_id,
       roundBankers(value, 1) AS rb,
       roundDown(CAST(floor(value) AS BIGINT), [0, 10, 25, 50, 75]) AS rd,
       roundAge(event_id % 90) AS ra,
       roundDuration(event_id * 37 % 40000) AS rdur,
       roundToExp2(event_id + 1) AS r2
FROM events
WHERE event_id < 300
ORDER BY event_id
"""


def _q168_rounding_family(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse rounding family through the shim: ``roundBankers``
    -> Spark's bround (half-even, matching DuckDB's default round),
    ``roundDown``/``roundAge``/``roundDuration`` as greatest-breakpoint
    filters over literal arrays, ``roundToExp2`` via exact power-of-two
    log arithmetic."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(clickhouse_to_spark_sql(_Q168_CLICKHOUSE_SQL))


_Q168_ORACLE = """
SELECT event_id,
       -- explicit HALF_EVEN at 1dp (DuckDB's round() is half-away on
       -- doubles; Spark's bround is banker's)
       CASE WHEN value * 10 - floor(value * 10) > 0.5
              THEN (floor(value * 10) + 1) / 10
            WHEN value * 10 - floor(value * 10) < 0.5
              THEN floor(value * 10) / 10
            ELSE (floor(value * 10) + CAST(floor(value * 10) AS BIGINT) % 2) / 10
       END AS rb,
       coalesce(list_max(list_filter([0, 10, 25, 50, 75],
         e -> e <= CAST(floor(value) AS BIGINT))), 0) AS rd,
       coalesce(list_max(list_filter([0, 1, 18, 25, 35, 45, 55],
         e -> e <= event_id % 90)), 0) AS ra,
       coalesce(list_max(list_filter([0, 1, 10, 30, 60, 120, 180, 240, 300,
         600, 1200, 1800, 3600, 7200, 18000, 36000],
         e -> e <= event_id * 37 % 40000)), 0) AS rdur,
       CASE WHEN event_id + 1 < 1 THEN 0
            ELSE CAST(pow(2, floor(log2(CAST(event_id + 1 AS DOUBLE)))) AS BIGINT)
       END AS r2
FROM events
WHERE event_id < 300
ORDER BY event_id
"""


SPECS.append(
    QuerySpec(
        "q168_rounding_family",
        "roundBankers/roundDown/roundAge/roundDuration/roundToExp2",
        _q168_rounding_family,
        _Q168_ORACLE,
    )
)


# --------------------------------------------- round-6 dialect batch

_Q169_CLICKHOUSE_SQL = r"""
SELECT lang,
       count() AS n,
       CAST(sum(length(replaceAll(text, ' ', ''))) AS BIGINT)
         AS chars_no_space,
       min(arrayStringConcat(arraySlice(splitByChar(' ', text), 1, 3), '-'))
         AS first3,
       CAST(sum(toInt64OrZero(replaceRegexpAll(source, '[a-z]+', '')))
            AS BIGINT) AS src_sum,
       max(leftPad(lang, 4, '_')) AS padded,
       CAST(sum(isFinite(1.0 * n_chars)) AS BIGINT) AS finite_n
FROM documents
GROUP BY lang
ORDER BY lang
"""


def _q169_dialect_round6(spark: SparkSession, sf: str) -> DataFrame:
    """Round-6 dialect batch through the shim, end-to-end on the
    fixture: replaceAll / replaceRegexpAll / splitByChar + arraySlice +
    arrayStringConcat / leftPad / toInt64OrZero (TRY_CAST under Spark's
    ANSI mode) / isFinite (0/1 like ClickHouse's UInt8)."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "documents").createOrReplaceTempView("documents")
    return spark.sql(clickhouse_to_spark_sql(_Q169_CLICKHOUSE_SQL))


_Q169_ORACLE = r"""
SELECT lang,
       count(*) AS n,
       CAST(sum(len(replace(text, ' ', ''))) AS BIGINT) AS chars_no_space,
       min(array_to_string(string_split(text, ' ')[1:3], '-')) AS first3,
       CAST(sum(CAST(regexp_replace(source, '[a-z]+', '', 'g') AS BIGINT))
            AS BIGINT) AS src_sum,
       max(lpad(lang, 4, '_')) AS padded,
       CAST(sum(CASE WHEN isfinite(1.0 * n_chars) THEN 1 ELSE 0 END)
            AS BIGINT) AS finite_n
FROM documents
GROUP BY lang
ORDER BY lang
"""


SPECS.append(
    QuerySpec(
        "q169_dialect_round6",
        "Dialect round-6 batch: replace*/extract, arraySlice, pads, "
        "OrZero/OrNull TRY_CASTs, float classifiers — through the shim",
        _q169_dialect_round6,
        _Q169_ORACLE,
    )
)


# ------------------------------------------- round-6 HOF batch (q170)

_Q170_CLICKHOUSE_SQL = r"""
SELECT lang,
       count() AS n,
       CAST(sum(arrayFirstIndex(w -> length(w) >= 9,
                                splitByWhitespace(text))) AS BIGINT)
         AS first_long_pos,
       CAST(sum(arrayLastIndex(w -> length(w) >= 9,
                               splitByWhitespace(text))) AS BIGINT)
         AS last_long_pos,
       min(arrayFirst(w -> length(w) >= 9, splitByWhitespace(text)))
         AS min_first_long,
       CAST(sum(bitTest(n_chars, 0)) AS BIGINT) AS odd_chars
FROM documents
GROUP BY lang
ORDER BY lang
"""


def _q170_dialect_hof(spark: SparkSession, sf: str) -> DataFrame:
    """Round-6 HOF batch through the shim: arrayFirst/arrayFirstIndex/
    arrayLastIndex (ClickHouse's lambda-first operand order reordered
    to Spark's array-first), splitByWhitespace, bitTest — evaluated on
    the fixture and aggregated so the oracle checks exact values."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "documents").createOrReplaceTempView("documents")
    return spark.sql(clickhouse_to_spark_sql(_Q170_CLICKHOUSE_SQL))


_Q170_ORACLE = r"""
WITH w AS (
  SELECT lang, n_chars,
         list_filter(string_split_regex(trim(text), '\s+'),
                     x -> x != '') AS ws
  FROM documents),
idx AS (
  SELECT lang, n_chars, ws,
         list_transform(range(1, len(ws) + 1),
                        i -> CASE WHEN length(ws[i]) >= 9 THEN i
                                  ELSE NULL END) AS hits
  FROM w)
SELECT lang,
       count(*) AS n,
       CAST(sum(coalesce(list_min(hits), 0)) AS BIGINT) AS first_long_pos,
       CAST(sum(coalesce(list_max(hits), 0)) AS BIGINT) AS last_long_pos,
       min(ws[list_min(hits)]) AS min_first_long,
       CAST(sum(n_chars % 2) AS BIGINT) AS odd_chars
FROM idx
GROUP BY lang
ORDER BY lang
"""


SPECS.append(
    QuerySpec(
        "q170_dialect_hof",
        "Round-6 HOF batch: arrayFirst/First-LastIndex (lambda-first "
        "reorder), splitByWhitespace, bitTest — through the shim",
        _q170_dialect_hof,
        _Q170_ORACLE,
    )
)

# ------------------------------------------- round-7 batches (q171/q172)

_Q171_CLICKHOUSE_SQL = r"""
SELECT lang,
       count() AS n,
       CAST(sum(editDistance(substring(text, 1, 10),
                             substring(text, 11, 10))) AS BIGINT) AS ed_sum,
       round(max(arrayJaccardIndex(tokens(substring(text, 1, 60)),
                                   tokens(substring(text, 31, 60)))), 6)
         AS jac_max,
       CAST(sum(multiSearchFirstIndex(text, ['data', 'the', 'merge']))
            AS BIGINT) AS msi_sum,
       CAST(sum(arrayCount(g -> length(g) = 3,
                           ngrams(substring(text, 1, 20), 3))) AS BIGINT)
         AS ng_sum,
       min(toDecimalString(n_chars / 7, 3)) AS dec_min
FROM documents
GROUP BY lang
ORDER BY lang
"""


def _q171_dialect_strsim(spark: SparkSession, sf: str) -> DataFrame:
    """Round-7 string-similarity batch through the shim: editDistance
    (levenshtein), arrayJaccardIndex over tokens() sets,
    multiSearchFirstIndex (leftmost-MATCH semantics, not list order),
    character ngrams, toDecimalString — aggregated per language so the
    oracle checks exact values.  All sums are over integers (jaccard,
    a double, uses max — order-insensitive, no FP accumulation)."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "documents").createOrReplaceTempView("documents")
    return spark.sql(clickhouse_to_spark_sql(_Q171_CLICKHOUSE_SQL))


_Q171_ORACLE = r"""
WITH d AS (
  SELECT lang, text, n_chars,
         list_filter(string_split_regex(substring(text, 1, 60),
                                        '[^\p{L}\p{N}_]+'),
                     x -> x != '') AS t1,
         list_filter(string_split_regex(substring(text, 31, 60),
                                        '[^\p{L}\p{N}_]+'),
                     x -> x != '') AS t2,
         [strpos(text, 'data'), strpos(text, 'the'),
          strpos(text, 'merge')] AS pos,
         substring(text, 1, 20) AS s20
  FROM documents)
SELECT lang,
       count(*) AS n,
       CAST(sum(levenshtein(substring(text, 1, 10),
                            substring(text, 11, 10))) AS BIGINT) AS ed_sum,
       round(max(CAST(len(list_intersect(t1, t2)) AS DOUBLE)
                 / len(list_distinct(list_concat(t1, t2)))), 6) AS jac_max,
       CAST(sum(coalesce(list_position(pos,
                  list_min(list_filter(pos, x -> x > 0))), 0)) AS BIGINT)
         AS msi_sum,
       CAST(sum(CASE WHEN length(s20) < 3 THEN 0
                     ELSE length(s20) - 2 END) AS BIGINT) AS ng_sum,
       min(printf('%.3f', n_chars / 7)) AS dec_min
FROM d
GROUP BY lang
ORDER BY lang
"""


SPECS.append(
    QuerySpec(
        "q171_dialect_strsim",
        "Round-7 string-sim batch: editDistance, arrayJaccardIndex, "
        "tokens, multiSearchFirstIndex, ngrams, toDecimalString",
        _q171_dialect_strsim,
        _Q171_ORACLE,
    )
)


_Q172_CLICKHOUSE_SQL = r"""
SELECT event_type,
       CAST(count() AS BIGINT) AS n,
       round(entropy(user_id % 10), 6) AS ent,
       CAST(sum(arrayReduce('sum', mapValues(mapUpdate(
              mapFromArrays(['a', 'c'], [user_id % 7, 99]),
              mapApply((k, v) -> (k, v + 1),
                       mapFromArrays(['c'], [user_id % 5]))))))
            AS BIGINT) AS map_sum,
       CAST(sum(arrayCount(x -> true, mapKeys(
              mapFilter((k, v) -> v % 3 = 0,
                        mapFromArrays(['x', 'y'], [user_id, user_id + 1])))))
            AS BIGINT) AS mf_cnt,
       CAST(sum(arrayElement(arrayEnumerateUniq(
              [user_id % 3, user_id % 2, user_id % 3]), 2)) AS BIGINT)
         AS enu_sum,
       CAST(sum(arrayElement(arrayRotateLeft(
              [user_id, event_id, 7], 1), 1)) AS BIGINT) AS rot_sum,
       max(toUnixTimestamp64Milli(ts)) AS max_ms,
       round(tupleElement(simpleLinearRegression(
               toFloat64(user_id), toFloat64(event_id)), 1), 6) AS slope
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def _q172_dialect_maps_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Round-7 map/stats batch through the shim: mapFilter / mapApply /
    mapUpdate (lambda-first reorder + entries round-trip; the update's
    key-'c' override is checked through an order-insensitive
    arrayReduce('sum') over mapValues), entropy (Shannon, log2),
    arrayEnumerateUniq, arrayRotateLeft, toUnixTimestamp64Milli,
    simpleLinearRegression (regr_slope under the tuple convention).
    Integer columns sum exactly; the two double columns (entropy,
    slope) round to 6."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(clickhouse_to_spark_sql(_Q172_CLICKHOUSE_SQL))


_Q172_ORACLE = r"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(entropy(user_id % 10), 6) AS ent,
       CAST(sum(user_id % 7 + user_id % 5 + 1) AS BIGINT) AS map_sum,
       CAST(sum(CAST(user_id % 3 = 0 AS INT)
                + CAST((user_id + 1) % 3 = 0 AS INT)) AS BIGINT) AS mf_cnt,
       CAST(sum(CASE WHEN user_id % 2 = user_id % 3 THEN 2 ELSE 1 END)
            AS BIGINT) AS enu_sum,
       CAST(sum(event_id) AS BIGINT) AS rot_sum,
       max(CAST(epoch_ms(ts) AS BIGINT)) AS max_ms,
       round(regr_slope(CAST(event_id AS DOUBLE),
                        CAST(user_id AS DOUBLE)), 6) AS slope
FROM events
GROUP BY event_type
ORDER BY event_type
"""


SPECS.append(
    QuerySpec(
        "q172_dialect_maps_stats",
        "Round-7 map/stats batch: mapFilter/Apply/Update, entropy, "
        "arrayEnumerateUniq, arrayRotate, unix-millis, linear regression",
        _q172_dialect_maps_stats,
        _Q172_ORACLE,
    )
)


_Q174_CLICKHOUSE_SQL = r"""
SELECT event_type,
       CAST(count() AS BIGINT) AS n,
       sumArray([user_id % 3, event_id % 7]) AS sa,
       minArray([user_id % 3, event_id % 7]) AS mna,
       maxArray([user_id % 3, event_id % 7]) AS mxa,
       CAST(countArray([user_id % 3, event_id % 7]) AS BIGINT) AS ca,
       avgArray([user_id % 3, event_id % 7]) AS av,
       sumDistinct(user_id % 10) AS sd,
       CAST(sum(arrayUniq([user_id % 2, user_id % 3],
                          [user_id % 3, user_id % 2])) AS BIGINT) AS au,
       min(extract(props, '"k": ([0-9]+)')) AS ex,
       CAST(sum(arrayElement(arrayPartialSort(2,
              [event_id % 5, user_id % 5, 3]), 1)) AS BIGINT) AS ps
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def _q174_dialect_combinators(spark: SparkSession, sf: str) -> DataFrame:
    """Round-7 combinator batch through the shim: the -Array aggregate
    combinators (per-row folds feeding ordinary aggregates — map-side,
    no explode), -Distinct spellings, n-ary arrayUniq (distinct
    tuples), regex extract() over the props JSON, arrayPartialSort.

    Exactness: every column is integer arithmetic except avgArray,
    which is exact anyway here — the per-row DOUBLE fold sums small
    integers (exact in double), the cross-row sum stays far below
    2^53, and the final division is one IEEE op on both engines."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(clickhouse_to_spark_sql(_Q174_CLICKHOUSE_SQL))


_Q174_ORACLE = r"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(user_id % 3 + event_id % 7) AS BIGINT) AS sa,
       min(least(user_id % 3, event_id % 7)) AS mna,
       max(greatest(user_id % 3, event_id % 7)) AS mxa,
       CAST(2 * count(*) AS BIGINT) AS ca,
       CAST(sum(user_id % 3 + event_id % 7) AS DOUBLE)
         / (2 * count(*)) AS av,
       CAST(sum(DISTINCT user_id % 10) AS BIGINT) AS sd,
       CAST(sum(CASE WHEN user_id % 2 = user_id % 3 THEN 1 ELSE 2 END)
            AS BIGINT) AS au,
       min(regexp_extract(props, '"k": ([0-9]+)', 1)) AS ex,
       CAST(sum(least(event_id % 5, user_id % 5, 3)) AS BIGINT) AS ps
FROM events
GROUP BY event_type
ORDER BY event_type
"""


SPECS.append(
    QuerySpec(
        "q174_dialect_combinators",
        "Round-7 combinator batch: -Array/-Distinct aggregates, n-ary "
        "arrayUniq, regex extract, arrayPartialSort — through the shim",
        _q174_dialect_combinators,
        _Q174_ORACLE,
    )
)
