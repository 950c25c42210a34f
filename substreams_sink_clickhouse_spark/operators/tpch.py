"""TPC-H-shaped analytical queries adapted to the fixture schema.

The reference's users run ad-hoc ClickHouse SQL over the sunk tables
(/root/reference/README.md:29-52); the TPC-H query set is the standard
proxy for that analytics surface.  SURVEY.md §2.2 already carries the
Q1/Q5/Q13/Q17 shapes (q04/q07/q08/q16); this module adds the remaining
classic shapes expressible over the driver fixtures (which lack
l_commitdate / l_receiptdate / l_shipmode, so Q12-style queries are out
of reach by schema, not by engine capability):

* ``tpch_q3``  — shipping-priority: 3-way join, filtered both sides of
  the date cutoff, grouped revenue, top-k.
* ``tpch_q4``  — order-priority checking: EXISTS → correlated left-semi
  join with a non-equi conjunct (l_shipdate > o_orderdate).
* ``tpch_q10`` — returned-item reporting: 4-way join, revenue per
  customer, top-k by revenue.
* ``tpch_q14`` — promotion effect: conditional revenue ratio in one
  single-pass aggregate (no self-join).
* ``tpch_q18`` — large-volume customer: HAVING on a grouped fact,
  re-joined to the fact's parents.
* ``tpch_q19`` — discounted revenue: disjunction of brand/size/quantity
  brackets — a pushdown torture test (the OR of AND-brackets reaches
  the scan as one filter).

Scale design: lineitem→orders joins shuffle on the join key once and
reuse it; ``part`` and other dimensions are ``broadcast()`` so the fact
side never shuffles for them (at 100 TB part may exceed broadcast — the
plans degrade to shuffle joins without rewrite).  All revenue sums are
algebraic aggregates (map-side partials), rounded identically in the
oracle so the value-hash is stable under summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from substreams_sink_clickhouse_spark.operators.spec import QuerySpec
from substreams_sink_clickhouse_spark.sources.tables import load_table

def _rev():
    # built lazily: classic-mode Column construction needs a live SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _tpch_q3(spark: SparkSession, sf: str) -> DataFrame:
    """Shipping priority: revenue of unshipped BUILDING orders."""
    c = load_table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c.select("c_custkey"), o.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(100)
    )


_TPCH_Q3_ORACLE = """
SELECT l_orderkey, o_orderdate, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 100
"""


def _tpch_q4(spark: SparkSession, sf: str) -> DataFrame:
    """Order-priority checking: EXISTS as a left-semi join whose
    condition mixes an equi key with a non-equi date conjunct.  Spark
    plans the equi part as the shuffle key and evaluates the date
    predicate as a join residual — one shuffle, no decorrelation UDF.
    """
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = load_table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_TPCH_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def _tpch_q10(spark: SparkSession, sf: str) -> DataFrame:
    """Returned-item reporting: revenue lost to returns per customer."""
    l = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_TPCH_Q10_ORACLE = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def _tpch_q14(spark: SparkSession, sf: str) -> DataFrame:
    """Promotion effect: PROMO share of revenue in one month — a
    conditional ratio computed in a single aggregate pass (the naive
    form self-joins; this is the single-scan rewrite)."""
    l = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


_TPCH_Q14_ORACLE = """
SELECT round(
         100.0 * sum(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
         / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
"""


def _tpch_q18(spark: SparkSession, sf: str) -> DataFrame:
    """Large-volume customers: orders whose total quantity exceeds the
    threshold, re-joined to the order/customer parents.  The HAVING
    aggregate runs first and is tiny; it broadcasts back against the
    parents, so the big fact is scanned exactly once."""
    l = load_table(spark, sf, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer").select("c_custkey", "c_name")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(100)
    )


_TPCH_Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 150) big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 100
"""


def _tpch_q19(spark: SparkSession, sf: str) -> DataFrame:
    """Discounted revenue over OR'd brand/size/quantity brackets.  The
    disjunction stays one Catalyst predicate: the part-side conjuncts
    (brand, size) are pushed to the broadcast build side and the mixed
    conjuncts evaluate as join residuals — no union-of-three-scans."""
    l = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(bracket)
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


_TPCH_Q19_ORACLE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1  AND 15 AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 30)
"""


SPECS = [
    QuerySpec(
        "tpch_q3",
        "TPC-H Q3 shape: shipping-priority top-k revenue",
        _tpch_q3,
        _TPCH_Q3_ORACLE,
    ),
    QuerySpec(
        "tpch_q4",
        "TPC-H Q4 shape: EXISTS via semi join with non-equi residual",
        _tpch_q4,
        _TPCH_Q4_ORACLE,
    ),
    QuerySpec(
        "tpch_q10",
        "TPC-H Q10 shape: returned-item revenue per customer",
        _tpch_q10,
        _TPCH_Q10_ORACLE,
    ),
    QuerySpec(
        "tpch_q14",
        "TPC-H Q14 shape: conditional revenue ratio, single pass",
        _tpch_q14,
        _TPCH_Q14_ORACLE,
    ),
    QuerySpec(
        "tpch_q18",
        "TPC-H Q18 shape: HAVING-filtered fact re-joined to parents",
        _tpch_q18,
        _TPCH_Q18_ORACLE,
    ),
    QuerySpec(
        "tpch_q19",
        "TPC-H Q19 shape: OR'd bracket predicates with pushdown",
        _tpch_q19,
        _TPCH_Q19_ORACLE,
    ),
]


def _tpch_q8(spark: SparkSession, sf: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): NATION_7's share of
    ASIA-customer revenue per order year.  Six joins — the two nation
    roles (customer's and supplier's) are separate broadcast builds of
    the same tiny table; the fact side shuffles only for orders."""
    l = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n1 = load_table(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    n2 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("y"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
        .orderBy("y")
    )


_TPCH_Q8_ORACLE = """
SELECT year(o_orderdate) AS y,
       round(sum(CASE WHEN n2.n_name = 'NATION_7'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA'
GROUP BY y ORDER BY y
"""


def _tpch_q9(spark: SparkSession, sf: str) -> DataFrame:
    """Product-line profit (TPC-H Q9 shape, sans supplycost — absent
    from the fixtures): revenue on '%red%' parts by supplier nation
    and order year.  part filters before its broadcast; lineitem
    shuffles once on orderkey."""
    l = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").filter(F.col("p_name").like("%red%")).select("p_partkey")
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("y"))
        .agg(F.round(F.sum(rev), 2).alias("profit"))
        .orderBy("nation", F.desc("y"))
    )


_TPCH_Q9_ORACLE = """
SELECT n_name AS nation, year(o_orderdate) AS y,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate) ORDER BY nation, y DESC
"""


def _tpch_q22(spark: SparkSession, sf: str) -> DataFrame:
    """Global sales opportunity (TPC-H Q22 shape): wealthy customers
    (balance above the positive-balance average) with no order since
    2000.  Scalar-subquery average folds to a plan literal; the
    NOT-EXISTS is a left-anti join against the date-filtered orders —
    the filter prunes the anti side before the shuffle."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    # scalar subquery as a broadcast 1-row join — fully lazy, no
    # driver-side collect at plan-build time
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    wealthy = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("ab")
    )
    return (
        wealthy.join(o, wealthy.c_custkey == o.o_custkey, "left_anti")
        .withColumn("band", (F.col("c_nationkey") % 5).cast("int"))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("band")
    )


_TPCH_Q22_ORACLE = """
SELECT band, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM (
  SELECT c_nationkey % 5 AS band, c_acctbal
  FROM customer
  WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
    AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '2000-01-01'))
GROUP BY band ORDER BY band
"""


SPECS.extend(
    [
        QuerySpec(
            "tpch_q8",
            "TPC-H Q8 shape: national market share, dual nation roles",
            _tpch_q8,
            _TPCH_Q8_ORACLE,
        ),
        QuerySpec(
            "tpch_q9",
            "TPC-H Q9 shape: product-line profit by nation and year",
            _tpch_q9,
            _TPCH_Q9_ORACLE,
        ),
        QuerySpec(
            "tpch_q22",
            "TPC-H Q22 shape: wealthy inactive customers via anti join",
            _tpch_q22,
            _TPCH_Q22_ORACLE,
        ),
    ]
)


def _tpch_q6(spark: SparkSession, sf: str) -> DataFrame:
    """Forecasting revenue change (TPC-H Q6 proper — q03 reuses this
    filter but projects; this is the canonical single-scan aggregate).
    Everything folds into one map-side partial sum over a fully
    pushed-down scan: the cheapest possible shape at 100 TB."""
    l = load_table(spark, sf, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") <= F.lit("1996-12-31").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


_TPCH_Q6_ORACLE = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <= TIMESTAMP '1996-12-31'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def _ch_any_join(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse ``ANY LEFT JOIN``: at most ONE right-side row per
    left row (the first match), vs standard SQL's row multiplication.
    Spark-first: reduce the right side to one deterministic row per
    key with ``min_by`` BEFORE the join — the join input shrinks to
    key cardinality, strictly cheaper than joining then deduping."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    first_order = o.groupBy("o_custkey").agg(
        F.expr("min_by(o_orderkey, o_orderkey)").alias("first_orderkey"),
        F.round(F.expr("min_by(o_totalprice, o_orderkey)"), 2).alias("first_price"),
    )
    return (
        c.join(first_order, c.c_custkey == first_order.o_custkey, "left")
        .select("c_custkey", "first_orderkey", "first_price")
        .orderBy("c_custkey")
        .limit(500)
    )


_ANY_JOIN_ORACLE = """
SELECT c_custkey, first_orderkey, round(first_price, 2) AS first_price
FROM customer
LEFT JOIN (
  SELECT o_custkey, min(o_orderkey) AS first_orderkey,
         min_by(o_totalprice, o_orderkey) AS first_price
  FROM orders GROUP BY o_custkey) f ON c_custkey = f.o_custkey
ORDER BY c_custkey LIMIT 500
"""


SPECS.extend(
    [
        QuerySpec(
            "tpch_q6",
            "TPC-H Q6 proper: single-scan pushed-down revenue aggregate",
            _tpch_q6,
            _TPCH_Q6_ORACLE,
        ),
        QuerySpec(
            "ch_any_join",
            "ClickHouse ANY LEFT JOIN: one right row per key via min_by",
            _ch_any_join,
            _ANY_JOIN_ORACLE,
        ),
    ]
)


def _tpch_q7(spark: SparkSession, sf: str) -> DataFrame:
    """Volume shipping (TPC-H Q7 shape): revenue flow between two
    nations by ship year, with the nation pair taken in BOTH
    directions (supplier nation <-> customer nation).

    Plan shape: lineitem joins orders on the fact key (one shuffle,
    reused), while supplier / customer / both nation roles broadcast.
    The nation-pair disjunction evaluates post-join on two broadcast
    columns — at 100 TB the fact side still only shuffles once."""
    n1 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_TPCH_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31')
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def _tpch_q15(spark: SparkSession, sf: str) -> DataFrame:
    """Top supplier (TPC-H Q15 shape): the revenue 'view' is a grouped
    aggregate over a quarter of lineitem; the scalar max of that view
    broadcasts back onto it (two uses of ONE aggregation — Spark
    reuses the shuffle via ReusedExchange), then the winning row joins
    the supplier dimension.  Revenue is rounded to cents before the
    max-equality so both engines compare identical values."""
    l = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_rev()), 2).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("mx"))
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_TPCH_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


SPECS.extend(
    [
        QuerySpec(
            "tpch_q7",
            "TPC-H Q7 shape: bidirectional nation-pair volume by year",
            _tpch_q7,
            _TPCH_Q7_ORACLE,
        ),
        QuerySpec(
            "tpch_q15",
            "TPC-H Q15 shape: top supplier vs scalar max of a revenue view",
            _tpch_q15,
            _TPCH_Q15_ORACLE,
        ),
    ]
)


def _tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 verbatim shape — the fixture
    carries every column Q1 needs).  One pass, all aggregates algebraic
    (map-side partials), grouped on the 6-value flag/status space, so
    at 100 TB this is a full scan plus a 6-row shuffle — the canonical
    "aggregation absorbs scale" plan.  Sums/avgs rounded identically in
    the oracle for hash stability under summation order."""
    l = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_TPCH_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def _tpch_q5(spark: SparkSession, sf: str) -> DataFrame:
    """Local supplier volume (TPC-H Q5 verbatim shape): revenue where
    the customer and supplier share a nation inside one region.  The
    c_nationkey = s_nationkey conjunct rides the l_suppkey join as a
    residual; nation/region/supplier broadcast so the fact shuffles
    only for the orders join."""
    c = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


_TPCH_Q5_ORACLE = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC
"""


def _tpch_q13(spark: SparkSession, sf: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape, adapted:
    the fixture has no o_comment, so the original's NOT LIKE
    comment-pattern exclusion becomes an o_orderpriority exclusion —
    same left-join-with-filtered-right + double aggregation skeleton).
    First groupBy is keyed on the join key, so Catalyst reuses the join
    exchange; second groupBy shuffles a ~100-row histogram."""
    c = load_table(spark, sf, "customer").select("c_custkey")
    o = load_table(spark, sf, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_TPCH_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def _tpch_q17(spark: SparkSession, sf: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape, adapted: the
    fixture has no p_container, so the container equality becomes a
    p_size bracket; threshold loosened to 0.5*avg so the fixture's
    uniform quantities still qualify rows).  The correlated scalar
    subquery (per-part avg quantity) decorrelates into a groupBy on
    the probe side re-joined by part key — both sides of that join are
    filtered by the broadcast part list first, so the heavy aggregate
    runs over only the qualifying parts' lineitems."""
    p = load_table(spark, sf, "part").filter(
        (F.col("p_brand") == "Brand#4") & (F.col("p_size") <= 5)
    ).select("p_partkey")
    l = load_table(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    lp = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    thresholds = lp.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("qty_cut")
    )
    return (
        lp.join(F.broadcast(thresholds.withColumnRenamed("l_partkey", "t_partkey")),
                F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


_TPCH_Q17_ORACLE = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#4' AND p_size <= 5
  AND l_quantity < (SELECT 0.5 * avg(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
"""


def _tpch_q21(spark: SparkSession, sf: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape, adapted:
    the fixture has no l_commitdate/l_receiptdate, so "late" becomes
    l_shipdate > o_orderdate + 60 days).  The original's
    EXISTS/NOT-EXISTS pair over sibling lineitems is re-expressed as
    one per-order aggregate — count of distinct suppliers and of
    distinct LATE suppliers — joined back to the late rows: an order
    qualifies when it has >=2 suppliers but exactly 1 late one.  That
    is two shuffles on l_orderkey total (Catalyst reuses the exchange)
    versus the naive plan's three self-joins of the fact table — the
    100 TB-safe decorrelation."""
    o = load_table(spark, sf, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    l = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = l.join(o, l.l_orderkey == o.o_orderkey)
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
    per_order = lo.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
    )
    # one row per LATE LINEITEM (not per supplier) — numwait counts
    # l1 rows, matching the original query's semantics
    late_rows = lo.filter(late).select("l_orderkey", "l_suppkey")
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        late_rows.join(
            per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)),
            "l_orderkey",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


_TPCH_Q21_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o2 ON o2.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o2.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


SPECS.extend(
    [
        QuerySpec(
            "tpch_q1",
            "TPC-H Q1: pricing summary, single-pass algebraic aggregate",
            _tpch_q1,
            _TPCH_Q1_ORACLE,
        ),
        QuerySpec(
            "tpch_q5",
            "TPC-H Q5: local supplier volume, residual equi-conjunct join",
            _tpch_q5,
            _TPCH_Q5_ORACLE,
        ),
        QuerySpec(
            "tpch_q13",
            "TPC-H Q13 shape: order-count distribution, double aggregation",
            _tpch_q13,
            _TPCH_Q13_ORACLE,
        ),
        QuerySpec(
            "tpch_q17",
            "TPC-H Q17 shape: correlated per-part avg decorrelated",
            _tpch_q17,
            _TPCH_Q17_ORACLE,
        ),
        QuerySpec(
            "tpch_q21",
            "TPC-H Q21 shape: waiting-supplier EXISTS pair as one aggregate",
            _tpch_q21,
            _TPCH_Q21_ORACLE,
        ),
    ]
)
