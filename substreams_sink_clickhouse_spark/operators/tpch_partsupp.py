"""TPC-H shapes over synthesized columns (Q2 / Q11 / Q16 / Q20 / Q12).

The driver fixtures ship no ``partsupp`` table and lineitem lacks
``l_shipmode`` / ``l_commitdate`` / ``l_receiptdate``, so the five
canonical TPC-H shapes that need them were schema-blocked (SURVEY.md
§2 note).  This module synthesizes the missing relations/columns
DETERMINISTICALLY on both engines.  Q12's lineitem extension (see
:data:`_LINEITEM_EXT` below) derives the three missing columns from
``(l_orderkey, l_linenumber, l_shipdate)`` with affine modular
formulas inlined identically in Spark and DuckDB — dbgen's own
construction is uniform draws over a mode list and bounded day
offsets, which these formulas mimic hash-free.

For partsupp it synthesizes from ``part`` × ``supplier`` — the TPC-H 4-suppliers-per-part
construction (dbgen's ``PS_SUPPKEY = (ps_partkey + i*(S/4 +
(ps_partkey-1)/S)) % S + 1``, adapted to the fixtures' 0-based keys)
with hash-free affine formulas for quantities and costs so Spark and
DuckDB inline bit-identical values:

* ``ps_suppkey   = (p + i*(ns/4 + p/ns)) % ns``  (integer division)
* ``ps_availqty  = (p*7 + i*13) % 9999 + 1``
* ``ps_cents     = (p*17 + i*31) % 99900 + 100`` — supply cost in
  integer cents; ``ps_supplycost = ps_cents / 100.0``.  Money math
  that feeds a comparison (Q11's HAVING) runs on the integer cents so
  the threshold can never flip on summation-order FP noise.

Scale design: partsupp is a pure map-side explode over ``part`` (4
rows per part, zero shuffle to build); the supplier count arrives as
a broadcast 1-row aggregate, never a collect.  At 100 TB a real
partsupp is a stored table — these plans read it the same way (the
loader is the only fixture-specific piece).

Reference parity: the reference's users run full TPC-H over
ClickHouse (README.md:29-52); Q2/Q11/Q16/Q20 complete the set of
classic shapes the engine covers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from substreams_sink_clickhouse_spark.operators.spec import QuerySpec
from substreams_sink_clickhouse_spark.sources.tables import load_table


def load_partsupp(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic synthesized partsupp (see module docstring).
    Map-only: explode 4 supplier slots per part; ``ns`` (supplier
    count) joins in as a broadcast 1-row aggregate."""
    p = load_table(spark, sf, "part").select("p_partkey")
    ns = load_table(spark, sf, "supplier").agg(F.count(F.lit(1)).alias("__ns"))
    return (
        p.crossJoin(F.broadcast(ns))
        .select("p_partkey", "__ns", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.expr(
                "(p_partkey + i * (__ns div 4 + p_partkey div __ns)) % __ns"
            ).alias("ps_suppkey"),
            F.expr("(p_partkey * 7 + i * 13) % 9999 + 1").alias("ps_availqty"),
            F.expr("(p_partkey * 17 + i * 31) % 99900 + 100").alias("ps_cents"),
            # CAST to DOUBLE first: a bare 100.0 literal is DECIMAL in
            # Spark SQL and the division would come out DECIMAL, while
            # the oracle's is DOUBLE
            F.expr(
                "CAST((p_partkey * 17 + i * 31) % 99900 + 100 AS DOUBLE) / 100.0"
            ).alias("ps_supplycost"),
        )
    )


#: DuckDB CTE mirroring :func:`load_partsupp` bit-for-bit.
_DUCK_PARTSUPP = """
partsupp AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey + t.i * (s.ns // 4 + p_partkey // s.ns)) % s.ns AS ps_suppkey,
         (p_partkey * 7 + t.i * 13) % 9999 + 1 AS ps_availqty,
         (p_partkey * 17 + t.i * 31) % 99900 + 100 AS ps_cents,
         ((p_partkey * 17 + t.i * 31) % 99900 + 100) / 100.0 AS ps_supplycost
  FROM part
  CROSS JOIN (SELECT count(*) AS ns FROM supplier) s
  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) t)
"""


def _tpch_q2(spark: SparkSession, sf: str) -> DataFrame:
    """Minimum-cost supplier (TPC-H Q2 shape): for STANDARD size-15
    parts, the EUROPE supplier(s) whose supply cost equals the
    region-wide minimum for that part.

    The correlated scalar min decorrelates to a grouped aggregate over
    the SAME region-filtered partsupp relation, re-joined on
    (part, cost) — the fact-side relation is built once; supplier /
    nation / region broadcast.  Cost equality is safe across engines:
    both compute the cost as one division of the same integer cents."""
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    n = load_table(spark, sf, "nation")
    s = load_table(spark, sf, "supplier")
    eu_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    ps_eu = load_partsupp(spark, sf).join(
        F.broadcast(eu_supp), F.col("ps_suppkey") == F.col("s_suppkey")
    )
    min_cost = ps_eu.groupBy(F.col("ps_partkey").alias("__mc_partkey")).agg(
        F.min("ps_supplycost").alias("__min_cost")
    )
    p = load_table(spark, sf, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    return (
        ps_eu.join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            min_cost,
            (F.col("ps_partkey") == F.col("__mc_partkey"))
            & (F.col("ps_supplycost") == F.col("__min_cost")),
            "left_semi",
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "ps_supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


_TPCH_Q2_ORACLE = f"""
WITH {_DUCK_PARTSUPP.strip()}
SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost
FROM part
JOIN partsupp ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
  AND ps_supplycost = (
    SELECT min(ps2.ps_supplycost)
    FROM partsupp ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def _tpch_q11(spark: SparkSession, sf: str) -> DataFrame:
    """Important stock identification (TPC-H Q11 shape): per-part
    stock value held by NATION_3 suppliers, keeping parts above 0.5%
    of the nation's total.

    TPC-H's fixed fraction (0.0001/SF) degenerates to an empty result
    as the corpus grows; the scale-invariant equivalent keeps parts
    whose stock value exceeds 2x the per-part average.  The compare
    runs entirely on BIGINT cents (``cents * n_parts > 2 * total``) —
    exact under any summation order, so the HAVING can never flip
    between engines on FP noise.  The scalar (total, n) pair is the
    same aggregate reduced once more and broadcast (one 1-row
    crossJoin, no collect)."""
    n3 = (
        load_table(spark, sf, "nation")
        .filter(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    supp3 = s.join(F.broadcast(n3), s.s_nationkey == F.col("n_nationkey")).select(
        "s_suppkey"
    )
    ps3 = load_partsupp(spark, sf).join(
        F.broadcast(supp3), F.col("ps_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    per_part = ps3.groupBy("ps_partkey").agg(
        F.sum(F.col("ps_cents") * F.col("ps_availqty")).alias("__cents")
    )
    total = per_part.agg(
        F.sum("__cents").alias("__total"), F.count(F.lit(1)).alias("__n")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("__cents") * F.col("__n") > 2 * F.col("__total"))
        .select(
            "ps_partkey",
            F.round(F.col("__cents") / 100.0, 2).alias("value"),
        )
        .orderBy(F.desc("value"), "ps_partkey")
    )


_TPCH_Q11_ORACLE = f"""
WITH {_DUCK_PARTSUPP.strip()},
ps3 AS (
  SELECT ps_partkey, ps_cents, ps_availqty
  FROM partsupp
  WHERE ps_suppkey IN (
    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3')),
per_part AS (
  SELECT ps_partkey, sum(ps_cents * ps_availqty) AS cents
  FROM ps3 GROUP BY ps_partkey)
SELECT ps_partkey, round(cents / 100.0, 2) AS value
FROM per_part
WHERE cents * (SELECT count(*) FROM per_part) > 2 * (SELECT sum(cents) FROM per_part)
ORDER BY value DESC, ps_partkey
"""


def _tpch_q16(spark: SparkSession, sf: str) -> DataFrame:
    """Parts/supplier relationship (TPC-H Q16 shape): supplier count
    per (brand, type, size) over a size list, excluding one brand, one
    type family, and flagged suppliers (negative balance stands in for
    dbgen's '%Customer%Complaints%' comment filter, absent from the
    fixture schema).

    NOT IN over a provably non-null key list is a left-anti join; the
    part dimension broadcasts; count(DISTINCT) shuffles once on the
    3-part group key."""
    sizes = [1, 5, 9, 15, 21, 28, 30]
    p = load_table(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "SMALL")
        & F.col("p_size").isin(sizes)
    )
    flagged = (
        load_table(spark, sf, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    ps = load_partsupp(spark, sf).join(
        F.broadcast(flagged), F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    return (
        ps.join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


_TPCH_Q16_ORACLE = f"""
WITH {_DUCK_PARTSUPP.strip()}
SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp
JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type <> 'SMALL'
  AND p_size IN (1, 5, 9, 15, 21, 28, 30)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def _tpch_q20(spark: SparkSession, sf: str) -> DataFrame:
    """Potential part promotion (TPC-H Q20 shape): NATION_9 suppliers
    holding more than half a year's shipped quantity of any 'red%'
    part they supply.

    The correlated quantity subquery decorrelates to ONE grouped
    aggregate over the date-sliced fact, inner-joined on the
    (part, supplier) pair — SQL's NULL-compare semantics for pairs
    with no shipments (excluded) fall out of the inner join.  The
    quantity compare is exact: l_quantity is integer-valued, so
    0.5*sum is representable.  lineitem is the only big relation and
    shuffles once on its group key."""
    shipped = (
        load_table(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("__qty"))
    )
    red = (
        load_table(spark, sf, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    cand = (
        load_partsupp(spark, sf)
        .join(F.broadcast(red), F.col("ps_partkey") == F.col("p_partkey"), "left_semi")
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("__qty"))
        .select("ps_suppkey")
    )
    n1 = (
        load_table(spark, sf, "nation")
        .filter(F.col("n_name") == "NATION_9")
        .select("n_nationkey")
    )
    s = load_table(spark, sf, "supplier")
    return (
        s.join(F.broadcast(n1), s.s_nationkey == F.col("n_nationkey"))
        .join(cand, s.s_suppkey == cand.ps_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


_TPCH_Q20_ORACLE = f"""
WITH {_DUCK_PARTSUPP.strip()}
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_9'
  AND s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND ps_availqty > (
        SELECT 0.5 * sum(l_quantity) FROM lineitem
        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'))
ORDER BY s_name
"""


#: Deterministic lineitem extension for Q12 (both engines inline the
#: SAME affine modular formulas — dbgen's construction is uniform
#: draws over the 7-mode list and bounded day offsets from
#: ship/commit anchors; these mimic it hash-free so the two engines
#: agree bit-for-bit):
#:
#: * ``mode_idx      = (l_orderkey*7 + l_linenumber*3) % 7``
#: * ``l_shipmode    = MODES[mode_idx]``
#: * ``l_commitdate  = l_shipdate + (-45 + (l_orderkey*11 + l_linenumber*5) % 91) days``
#:   (±45 days around shipdate, so "shipped before commit" splits the data)
#: * ``l_receiptdate = l_shipdate + (1 + (l_orderkey*3 + l_linenumber*7) % 30) days``
#:   (dbgen: receipt = ship + random(1..30))
#:
#: All arithmetic is integer + calendar-day intervals on TIMESTAMP —
#: no floats anywhere, so the predicate set can never flip on FP noise.
_MODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]


def _tpch_q12(spark: SparkSession, sf: str) -> DataFrame:
    """Shipping modes and order priority (TPC-H Q12): for MAIL/SHIP
    lineitems received in 1997 that were committed late
    (receipt > commit) but shipped on time (ship < commit), count
    high- vs low-priority orders per mode.

    Scale design: the synthesized columns are a pure map-side projection
    over lineitem (zero extra shuffle); the mode/date predicates apply
    BEFORE the orders join, so only the ~1/7 × date-window slice of the
    fact shuffles.  orders joins on o_orderkey — at fixture scale AQE
    broadcasts it; at 100 TB both sides shuffle-join on the key, the
    right plan for two fact-sized relations.  The final groupBy has 2
    groups (MAIL/SHIP) — trivially map-side combinable.

    Reference parity: closes the last fixture-blocked TPC-H shape; the
    reference's users run the full suite over ClickHouse
    (README.md:29-52)."""
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey",
        F.expr(
            "element_at(array('REG AIR','AIR','RAIL','SHIP','TRUCK','MAIL','FOB'), "
            "cast((l_orderkey * 7 + l_linenumber * 3) % 7 AS INT) + 1)"
        ).alias("l_shipmode"),
        F.expr(
            "l_shipdate + make_interval(0, 0, 0, "
            "cast(-45 + (l_orderkey * 11 + l_linenumber * 5) % 91 AS INT))"
        ).alias("l_commitdate"),
        F.expr(
            "l_shipdate + make_interval(0, 0, 0, "
            "cast(1 + (l_orderkey * 3 + l_linenumber * 7) % 30 AS INT))"
        ).alias("l_receiptdate"),
        "l_shipdate",
    )
    li = li.filter(
        F.col("l_shipmode").isin("MAIL", "SHIP")
        & (F.col("l_commitdate") < F.col("l_receiptdate"))
        & (F.col("l_shipdate") < F.col("l_commitdate"))
        & (F.col("l_receiptdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_receiptdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_shipmode")
        .agg(
            F.count(F.when(hi, 1)).alias("high_line_count"),
            F.count(F.when(~hi, 1)).alias("low_line_count"),
        )
        .orderBy("l_shipmode")
    )


_TPCH_Q12_ORACLE = """
WITH li AS (
  SELECT l_orderkey,
         (['REG AIR','AIR','RAIL','SHIP','TRUCK','MAIL','FOB'])
           [CAST((l_orderkey * 7 + l_linenumber * 3) % 7 AS INT) + 1] AS l_shipmode,
         l_shipdate + (-45 + (l_orderkey * 11 + l_linenumber * 5) % 91) * INTERVAL 1 DAY
           AS l_commitdate,
         l_shipdate + (1 + (l_orderkey * 3 + l_linenumber * 7) % 30) * INTERVAL 1 DAY
           AS l_receiptdate,
         l_shipdate
  FROM lineitem)
SELECT l_shipmode,
       count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
         AS high_line_count,
       count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
         AS low_line_count
FROM li
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipmode IN ('MAIL', 'SHIP')
  AND l_commitdate < l_receiptdate
  AND l_shipdate < l_commitdate
  AND l_receiptdate >= TIMESTAMP '1997-01-01'
  AND l_receiptdate < TIMESTAMP '1998-01-01'
GROUP BY l_shipmode
ORDER BY l_shipmode
"""


SPECS = [
    QuerySpec(
        "tpch_q2",
        "TPC-H Q2 shape: min-cost regional supplier via decorrelated min",
        _tpch_q2,
        _TPCH_Q2_ORACLE,
    ),
    QuerySpec(
        "tpch_q11",
        "TPC-H Q11 shape: stock value above a scalar fraction, exact cents math",
        _tpch_q11,
        _TPCH_Q11_ORACLE,
    ),
    QuerySpec(
        "tpch_q16",
        "TPC-H Q16 shape: supplier count per brand/type/size with NOT IN",
        _tpch_q16,
        _TPCH_Q16_ORACLE,
    ),
    QuerySpec(
        "tpch_q20",
        "TPC-H Q20 shape: suppliers over half a year's shipped quantity",
        _tpch_q20,
        _TPCH_Q20_ORACLE,
    ),
    QuerySpec(
        "tpch_q12",
        "TPC-H Q12: shipmode priority counts over synthesized ship columns",
        _tpch_q12,
        _TPCH_Q12_ORACLE,
    ),
]
