"""ClickHouse-compat gate entries, round-7 extension batch 4.

Every entry feeds ClickHouse SQL through the dialect shim
(``clickhouse_to_spark_sql``) and is oracle-checked against DuckDB at
both SFs — the round-7 dialect_ext surface under the hard gate:

* ``q175_dialect_math``       — gcd/lcm/trunc/positiveModulo/intExp2/
  bitRotateLeft/erf scalar batch (reference users' ad-hoc arithmetic).
* ``q176_dialect_datetime2``  — Sunday-start weeks (toStartOfWeek /
  toWeek / toYearWeek mode 0), formatDateTime %-patterns, dateName,
  toYYYYMMDDhhmmss, makeDate, toModifiedJulianDay.
* ``q177_dialect_url_strings`` — URL family + format()/
  replaceRegexpOne/stringJaccardIndex over synthesized URLs.
* ``q178_dialect_stat_tests`` — welch/student t (+ normal-approx p),
  rankCorr, cramersV(+bias corrected), theilsU, contingency,
  mannWhitneyUTest; doubles rounded to 4 like the q85 precedent.
* ``q179_dialect_funnel``     — windowFunnel / retention /
  sequenceMatch per cohort over a unique monotonic "time" (event_id:
  no timestamp ties, so both engines see one well-defined answer).
* ``q180_dialect_fold_aggs``  — intervalLengthSum, maxIntersections,
  deltaSumTimestamp, sumMap (two-array form), uniqArray, histogram.

Scale notes.  Everything is a single hash-aggregate exchange over
events/orders/customer; the collect_list-fold aggregates keep state
bounded per GROUP (cohort/event_type — the ClickHouse aggregates hold
the same per-group state).  The O(n^2) rank-based tests (rankCorr,
mannWhitneyUTest) run on a deterministic 1-in-23 sample — at cluster
scale the value-grouped q113/q115 operator shapes are the path, which
is exactly what the reference's users get from ClickHouse too (its
rankCorr materializes the group in memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from substreams_sink_clickhouse_spark.operators.spec import QuerySpec
from substreams_sink_clickhouse_spark.sources.tables import load_table

SPECS: list[QuerySpec] = []


def _via_shim(
    spark: SparkSession,
    sf: str,
    tables: list[str],
    sql: str,
    column_types: dict[str, str] | None = None,
    parallel: list[str] | None = None,
) -> DataFrame:
    """Translate + run ClickHouse SQL over the named fixture tables.

    ``parallel`` lists tables whose downstream per-row work is
    expression-dense (string similarity, stat tests): those views are
    wrapped in ``ensure_parallelism`` so the compute does not ride the
    fixture's single-row-group scan on one core.  No-op at real scale,
    where inputs have many splits."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )
    from substreams_sink_clickhouse_spark.functions.skew import ensure_parallelism

    for name in tables:
        df = load_table(spark, sf, name)
        if parallel and name in parallel:
            df = ensure_parallelism(df)
        df.createOrReplaceTempView(name)
    return spark.sql(clickhouse_to_spark_sql(sql, column_types=column_types))


# ------------------------------------------------------- q175 math
_Q175_CH = """
SELECT event_type,
       toInt64(sum(gcd(user_id % 96 + 4, 60)))            AS sg,
       toInt64(sum(lcm(user_id % 5 + 1, 4)))              AS sl,
       sum(trunc(value))                                  AS st,
       toInt64(sum(positiveModulo(user_id - 50, 7)))      AS pm,
       toInt64(sum(intExp2(event_id % 10)))               AS x2,
       toInt64(sum(bitRotateLeft(user_id % 256, 3)))      AS rot,
       round(min(erf(value / 100)), 6)                    AS emn,
       round(max(erfc(value / 100)), 6)                   AS emx
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def _q175_dialect_math(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar-math batch through the shim.  Exactness: every sum is
    integer (gcd/lcm/pmod/intExp2/rotate are BIGINT folds; trunc(x)
    yields integer-valued doubles whose sum is exact below 2^53);
    erf's A&S polynomial is evaluated identically by both engines on
    the same single value (min/max are order-free), rounded to 6."""
    return _via_shim(spark, sf, ["events"], _Q175_CH)


_Q175_ORACLE = r"""
SELECT event_type,
       CAST(sum(gcd(user_id % 96 + 4, 60)) AS BIGINT)       AS sg,
       CAST(sum(lcm(user_id % 5 + 1, 4)) AS BIGINT)         AS sl,
       CAST(sum(trunc(value)) AS DOUBLE)                    AS st,
       CAST(sum((user_id - 50) % 7 + CASE WHEN (user_id - 50) % 7 < 0
                THEN 7 ELSE 0 END) AS BIGINT)               AS pm,
       CAST(sum(CAST(pow(2, event_id % 10) AS BIGINT)) AS BIGINT) AS x2,
       CAST(sum((user_id % 256) * 8) AS BIGINT)             AS rot,
       round(min(CASE WHEN value >= 0
         THEN 1.0 - (((((1.061405429 * (1.0 / (1.0 + 0.3275911 * abs(value / 100.0)))
              - 1.453152027) * (1.0 / (1.0 + 0.3275911 * abs(value / 100.0))))
              + 1.421413741) * (1.0 / (1.0 + 0.3275911 * abs(value / 100.0)))
              - 0.284496736) * (1.0 / (1.0 + 0.3275911 * abs(value / 100.0)))
              + 0.254829592) * (1.0 / (1.0 + 0.3275911 * abs(value / 100.0)))
              * exp(-(value / 100.0) * (value / 100.0))
         ELSE -(1.0 - (((((1.061405429 * (1.0 / (1.0 + 0.3275911 * abs(value / 100.0)))
              - 1.453152027) * (1.0 / (1.0 + 0.3275911 * abs(value / 100.0))))
              + 1.421413741) * (1.0 / (1.0 + 0.3275911 * abs(value / 100.0)))
              - 0.284496736) * (1.0 / (1.0 + 0.3275911 * abs(value / 100.0)))
              + 0.254829592) * (1.0 / (1.0 + 0.3275911 * abs(value / 100.0)))
              * exp(-(value / 100.0) * (value / 100.0)))
         END), 6)                                           AS emn,
       round(max(1.0 - (CASE WHEN value >= 0
         THEN 1.0 - (((((1.061405429 * (1.0 / (1.0 + 0.3275911 * abs(value / 100.0)))
              - 1.453152027) * (1.0 / (1.0 + 0.3275911 * abs(value / 100.0))))
              + 1.421413741) * (1.0 / (1.0 + 0.3275911 * abs(value / 100.0)))
              - 0.284496736) * (1.0 / (1.0 + 0.3275911 * abs(value / 100.0)))
              + 0.254829592) * (1.0 / (1.0 + 0.3275911 * abs(value / 100.0)))
              * exp(-(value / 100.0) * (value / 100.0))
         ELSE -(1.0 - (((((1.061405429 * (1.0 / (1.0 + 0.3275911 * abs(value / 100.0)))
              - 1.453152027) * (1.0 / (1.0 + 0.3275911 * abs(value / 100.0))))
              + 1.421413741) * (1.0 / (1.0 + 0.3275911 * abs(value / 100.0)))
              - 0.284496736) * (1.0 / (1.0 + 0.3275911 * abs(value / 100.0)))
              + 0.254829592) * (1.0 / (1.0 + 0.3275911 * abs(value / 100.0)))
              * exp(-(value / 100.0) * (value / 100.0)))
         END)), 6)                                          AS emx
FROM events
GROUP BY event_type
ORDER BY event_type
"""

SPECS.append(QuerySpec(
    "q175_dialect_math",
    "Scalar-math dialect batch: gcd/lcm/trunc/positiveModulo/intExp2/"
    "bitRotateLeft/erf through the shim",
    _q175_dialect_math,
    _Q175_ORACLE,
))


# ------------------------------------------------- q176 datetime 2
_Q176_CH = """
SELECT toStartOfWeek(o_orderdate)                                   AS wk,
       toInt64(count())                                             AS n,
       min(toWeek(o_orderdate))                                     AS w0,
       min(toYearWeek(o_orderdate))                                 AS yw,
       min(formatDateTime(o_orderdate, '%F %T'))                    AS fd,
       min(toYYYYMMDDhhmmss(o_orderdate))                           AS ymds,
       min(dateName('weekday', o_orderdate))                        AS dn,
       min(toModifiedJulianDay(toString(toDate(o_orderdate))))      AS mjd,
       min(makeDate(toYear(o_orderdate), toMonth(o_orderdate), 1))  AS mo
FROM orders
GROUP BY wk
ORDER BY wk
"""


def _q176_dialect_datetime2(spark: SparkSession, sf: str) -> DataFrame:
    """Week-mode date batch: Sunday-start weeks (mode 0 — the
    ClickHouse default date_trunc cannot express), MySQL-convention
    week numbers with the year-rollover week-0 case, %-pattern
    formatting, and the Modified-Julian-Day epoch."""
    return _via_shim(spark, sf, ["orders"], _Q176_CH)


# DuckDB dayofweek: Sunday=0 (ClickHouse formula uses Sunday=1 —
# adjusted below); week-0 rows roll into the previous year's last week.
_Q176_ORACLE = r"""
WITH base AS (
  SELECT CAST(o_orderdate AS DATE) AS d, o_orderdate AS ts FROM orders
), wkd AS (
  SELECT d, ts,
         d - CAST(dayofweek(d) AS INT) AS wk,
         dayofyear(d) AS doy,
         ((7 - dayofweek(make_date(year(d), 1, 1))) % 7) + 1 AS fs,
         year(d) AS yr
  FROM base
), wnum AS (
  SELECT *,
         CASE WHEN doy < fs THEN 0 ELSE (doy - fs) // 7 + 1 END AS w0,
         CASE WHEN doy >= fs THEN yr * 100 + (doy - fs) // 7 + 1
              ELSE (yr - 1) * 100
                   + (dayofyear(make_date(yr - 1, 12, 31))
                      - (((7 - dayofweek(make_date(yr - 1, 1, 1))) % 7) + 1)) // 7 + 1
         END AS yw
  FROM wkd
)
SELECT wk,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(w0) AS INT) AS w0,
       CAST(min(yw) AS INT) AS yw,
       min(strftime(ts, '%Y-%m-%d %H:%M:%S')) AS fd,
       CAST(min(strftime(ts, '%Y%m%d%H%M%S')) AS BIGINT) AS ymds,
       min(dayname(d)) AS dn,
       CAST(min(d - DATE '1858-11-17') AS INT) AS mjd,
       min(make_date(year(d), month(d), 1)) AS mo
FROM wnum
GROUP BY wk
ORDER BY wk
"""

SPECS.append(QuerySpec(
    "q176_dialect_datetime2",
    "Sunday-start weeks, mode-0 week numbers, formatDateTime "
    "%-patterns, dateName, MJD, makeDate — through the shim",
    _q176_dialect_datetime2,
    _Q176_ORACLE,
))


# --------------------------------------------- q177 URL + strings
_Q177_CH = """
SELECT c_custkey,
       domain(url)                                   AS dom,
       topLevelDomain(url)                           AS tld,
       path(url)                                     AS pth,
       extractURLParameter(url, 'id')                AS pid,
       arrayStringConcat(extractURLParameterNames(url), ',') AS pnames,
       firstSignificantSubdomain(url)                AS fsd,
       cutToFirstSignificantSubdomain(url)           AS cutd,
       netloc(url)                                   AS nl,
       encodeURLComponent(c_name)                    AS enc,
       format('{}-{}', c_mktsegment, toString(c_custkey)) AS fmt,
       replaceRegexpOne(c_name, '[0-9]', '#')        AS rro,
       round(stringJaccardIndex(c_mktsegment, 'BUILDING'), 6) AS jac
FROM (
  SELECT c_custkey, c_name, c_mktsegment,
         concat('https://www.shop-', lower(c_mktsegment),
                '.example.co/seg/p?id=', toString(c_custkey),
                '&ref=home#top') AS url
  FROM customer
)
ORDER BY c_custkey
"""


def _q177_dialect_url_strings(spark: SparkSession, sf: str) -> DataFrame:
    """URL-analytics batch over synthesized URLs (both engines build
    the same string, so every function result is cross-checkable).
    stringJaccardIndex matches DuckDB's jaccard() definition
    (character-set Jaccard) exactly."""
    return _via_shim(spark, sf, ["customer"], _Q177_CH)


_Q177_ORACLE = r"""
WITH u AS (
  SELECT c_custkey, c_name, c_mktsegment,
         'www.shop-' || lower(c_mktsegment) || '.example.co' AS host
  FROM customer
)
SELECT c_custkey,
       host AS dom,
       'co' AS tld,
       '/seg/p' AS pth,
       CAST(c_custkey AS VARCHAR) AS pid,
       'id,ref' AS pnames,
       'example' AS fsd,
       'example.co' AS cutd,
       host AS nl,
       replace(c_name, '#', '%23') AS enc,
       format('{}-{}', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS fmt,
       regexp_replace(c_name, '[0-9]', '#') AS rro,
       round(jaccard(c_mktsegment, 'BUILDING'), 6) AS jac
FROM u
ORDER BY c_custkey
"""

SPECS.append(QuerySpec(
    "q177_dialect_url_strings",
    "URL family + format/replaceRegexpOne/stringJaccardIndex over "
    "synthesized URLs — through the shim",
    _q177_dialect_url_strings,
    _Q177_ORACLE,
))


# -------------------------------------------- q178 statistical tests
#: the A&S erf polynomial as DuckDB SQL over a bound alias {x}
def _duck_erf(x: str) -> str:
    t_ = f"(1.0 / (1.0 + 0.3275911 * abs({x})))"
    mag = (
        f"(1.0 - ((((1.061405429 * {t_} - 1.453152027) * {t_} "
        f"+ 1.421413741) * {t_} - 0.284496736) * {t_} "
        f"+ 0.254829592) * {t_} * exp(-({x}) * ({x})))"
    )
    return f"(CASE WHEN {x} >= 0 THEN {mag} ELSE -{mag} END)"


_Q178_CH = """
SELECT round(tupleElement(welchTTest(value, user_id % 2), 1), 4)    AS wt,
       round(tupleElement(welchTTest(value, user_id % 2), 2), 4)    AS wp,
       round(tupleElement(studentTTest(value, user_id % 2), 1), 4)  AS st,
       round(rankCorr(value, toFloat64(event_id % 97)), 4)          AS rc,
       round(cramersV(event_type, toString(user_id % 5)), 4)        AS cv,
       round(cramersVBiasCorrected(event_type, toString(user_id % 5)), 4) AS cvb,
       round(theilsU(event_type, toString(user_id % 5)), 4)         AS tu,
       round(contingency(event_type, toString(user_id % 5)), 4)     AS cg,
       round(tupleElement(mannWhitneyUTest(value, user_id % 2), 1), 4) AS mwu
FROM events
WHERE event_id % 23 = 0
ORDER BY wt
"""


def _q178_dialect_stat_tests(spark: SparkSession, sf: str) -> DataFrame:
    """The hypothesis-test aggregate family on a deterministic 1-in-23
    sample (the rank-based members are O(n^2) inside the group — the
    value-grouped q113/q115 operator shapes are the full-scale path).
    Doubles rounded to 4, the q85 precedent; p-values use the shared
    erf normal approximation on both engines."""
    return _via_shim(spark, sf, ["events"], _Q178_CH)


_Q178_ORACLE = rf"""
WITH s AS (
  SELECT value AS v, user_id % 2 AS g, event_type AS a,
         CAST(user_id % 5 AS VARCHAR) AS b,
         CAST(event_id % 97 AS DOUBLE) AS y
  FROM events WHERE event_id % 23 = 0
), m AS (
  SELECT count(*) FILTER (g = 0)::DOUBLE AS n0,
         count(*) FILTER (g = 1)::DOUBLE AS n1,
         avg(v) FILTER (g = 0) AS m0, avg(v) FILTER (g = 1) AS m1,
         var_samp(v) FILTER (g = 0) AS v0,
         var_samp(v) FILTER (g = 1) AS v1
  FROM s
), t AS (
  SELECT (m0 - m1) / sqrt(v0 / n0 + v1 / n1) AS wt,
         (m0 - m1) / sqrt(((n0 - 1) * v0 + (n1 - 1) * v1)
                          / (n0 + n1 - 2) * (1.0 / n0 + 1.0 / n1)) AS st
  FROM m
), ranked AS (
  SELECT (rank() OVER (ORDER BY v) + count(*) OVER ()
          - rank() OVER (ORDER BY v DESC)) / 2.0 + 0.5 AS rv,
         (rank() OVER (ORDER BY y) + count(*) OVER ()
          - rank() OVER (ORDER BY y DESC)) / 2.0 + 0.5 AS ry,
         g
  FROM s
), rc AS (
  SELECT corr(rv, ry) AS rc FROM ranked
), mw AS (
  SELECT sum(rv) FILTER (g = 1)
         - (count(*) FILTER (g = 1))::DOUBLE
           * (count(*) FILTER (g = 1) + 1) / 2.0 AS u
  FROM ranked
), cells AS (
  SELECT a, b, count(*)::DOUBLE AS nab FROM s GROUP BY a, b
), marg AS (
  SELECT c.a, c.b, c.nab,
         sum(c.nab) OVER (PARTITION BY c.a) AS na,
         sum(c.nab) OVER (PARTITION BY c.b) AS nb,
         sum(c.nab) OVER () AS n
  FROM cells c
), chi AS (
  SELECT any_value(n) AS n,
         any_value(n) * sum(nab * nab / (na * nb)) - any_value(n) AS chi2,
         count(DISTINCT a)::DOUBLE AS r, count(DISTINCT b)::DOUBLE AS c
  FROM marg
), hx AS (
  SELECT -sum((na / n) * ln(na / n)) AS hx
  FROM (SELECT DISTINCT a, na, n FROM marg)
), hxy AS (
  SELECT -sum((nab / n) * ln(nab / nb)) AS hxy FROM marg
)
SELECT round(t.wt, 4) AS wt,
       round(1.0 - {_duck_erf('(abs(t.wt) / sqrt(2.0))')}, 4) AS wp,
       round(t.st, 4) AS st,
       round(rc.rc, 4) AS rc,
       round(sqrt((chi.chi2 / chi.n) / least(chi.r - 1, chi.c - 1)), 4) AS cv,
       round(sqrt(greatest(0.0, chi.chi2 / chi.n
                  - (chi.r - 1) * (chi.c - 1) / (chi.n - 1))
             / least(chi.r - pow(chi.r - 1, 2) / (chi.n - 1) - 1,
                     chi.c - pow(chi.c - 1, 2) / (chi.n - 1) - 1)), 4) AS cvb,
       round((hx.hx - hxy.hxy) / hx.hx, 4) AS tu,
       round(sqrt(chi.chi2 / (chi.chi2 + chi.n)), 4) AS cg,
       round(mw.u, 4) AS mwu
FROM t, rc, chi, hx, hxy, mw
ORDER BY wt
"""

SPECS.append(QuerySpec(
    "q178_dialect_stat_tests",
    "welch/student t + p, rankCorr, cramersV(+corrected), theilsU, "
    "contingency, mannWhitneyU — through the shim",
    _q178_dialect_stat_tests,
    _Q178_ORACLE,
))


# ------------------------------------------------- q179 funnels
_Q179_CH = """
SELECT user_id % 50 AS cohort,
       windowFunnel(1000000000)(toFloat64(event_id),
           event_type = 'click', event_type = 'view',
           event_type = 'purchase')                             AS lvl,
       retention(event_type = 'click', event_type = 'purchase',
                 event_type = 'error')[1]                       AS r1,
       retention(event_type = 'click', event_type = 'purchase',
                 event_type = 'error')[2]                       AS r2,
       retention(event_type = 'click', event_type = 'purchase',
                 event_type = 'error')[3]                       AS r3,
       sequenceMatch('(?1).*(?2)')(toFloat64(event_id),
           event_type = 'click', event_type = 'purchase')       AS sm
FROM events
GROUP BY cohort
ORDER BY cohort
"""


def _q179_dialect_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Behavioral-analytics batch per cohort.  The chain "time" is
    event_id (unique and monotonic with ingestion), so the greedy
    funnel and the oracle's iterated-min chain see identical,
    tie-free orderings; with the window spanning the whole id range,
    windowFunnel's greedy equals plain subsequence existence, which
    the oracle computes step by step."""
    return _via_shim(spark, sf, ["events"], _Q179_CH)


_Q179_ORACLE = r"""
WITH e AS (
  SELECT user_id % 50 AS cohort, event_id AS t, event_type AS et
  FROM events
), t1 AS (
  SELECT cohort, min(t) AS t1 FROM e WHERE et = 'click' GROUP BY cohort
), t2 AS (
  SELECT e.cohort, min(e.t) AS t2
  FROM e JOIN t1 ON e.cohort = t1.cohort
  WHERE e.et = 'view' AND e.t > t1.t1 GROUP BY e.cohort
), t3 AS (
  SELECT e.cohort, min(e.t) AS t3
  FROM e JOIN t2 ON e.cohort = t2.cohort
  WHERE e.et = 'purchase' AND e.t > t2.t2 GROUP BY e.cohort
), flags AS (
  SELECT cohort,
         max(CASE WHEN et = 'click' THEN 1 ELSE 0 END) AS c1,
         max(CASE WHEN et = 'purchase' THEN 1 ELSE 0 END) AS c2,
         max(CASE WHEN et = 'error' THEN 1 ELSE 0 END) AS c3,
         min(CASE WHEN et = 'click' THEN t END) AS minc,
         max(CASE WHEN et = 'purchase' THEN t END) AS maxp
  FROM e GROUP BY cohort
)
SELECT f.cohort AS cohort,
       CAST(CASE WHEN t3.t3 IS NOT NULL THEN 3
                 WHEN t2.t2 IS NOT NULL THEN 2
                 WHEN t1.t1 IS NOT NULL THEN 1
                 ELSE 0 END AS INT) AS lvl,
       CAST(f.c1 AS TINYINT) AS r1,
       CAST(f.c1 * f.c2 AS TINYINT) AS r2,
       CAST(f.c1 * f.c3 AS TINYINT) AS r3,
       CAST(CASE WHEN f.minc IS NOT NULL AND f.maxp IS NOT NULL
                 AND f.minc < f.maxp THEN 1 ELSE 0 END AS TINYINT) AS sm
FROM flags f
LEFT JOIN t1 ON f.cohort = t1.cohort
LEFT JOIN t2 ON f.cohort = t2.cohort
LEFT JOIN t3 ON f.cohort = t3.cohort
ORDER BY cohort
"""

SPECS.append(QuerySpec(
    "q179_dialect_funnel",
    "windowFunnel/retention/sequenceMatch per cohort — through the shim",
    _q179_dialect_funnel,
    _Q179_ORACLE,
))


# --------------------------------------------- q180 fold aggregates
_Q180_CH = """
SELECT event_type,
       round(intervalLengthSum(value, value + 5), 6)            AS ils,
       maxIntersections(user_id % 100, user_id % 100 + 10)      AS mi,
       deltaSumTimestamp(toInt64(value), event_id)              AS dst,
       arrayStringConcat(tupleElement(sumMap(
           [concat('k', toString(user_id % 3))],
           [event_id % 100]), 1), ',')                          AS smk,
       arrayStringConcat(arrayMap(v -> toString(v),
           tupleElement(sumMap([concat('k', toString(user_id % 3))],
                               [event_id % 100]), 2)), ',')     AS smv,
       uniqArray([user_id % 7, event_id % 5])                   AS ua,
       arrayStringConcat(arrayMap(h ->
           toString(toInt64(round(tupleElement(h, 1) * 1000))),
           histogram(4)(toFloat64(user_id % 89))), ',')         AS hlo,
       arrayStringConcat(arrayMap(h ->
           toString(toInt64(round(tupleElement(h, 2) * 1000))),
           histogram(4)(toFloat64(user_id % 89))), ',')         AS hhi,
       arrayStringConcat(arrayMap(h ->
           toString(toInt64(tupleElement(h, 3))),
           histogram(4)(toFloat64(user_id % 89))), ',')         AS hct
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def _q180_dialect_fold_aggs(spark: SparkSession, sf: str) -> DataFrame:
    """Collect-fold aggregate batch.  Determinism notes: the interval
    folds run over fully-sorted struct arrays (ties resolved by the
    whole struct), so both engines add the same numbers in the same
    order; deltaSumTimestamp orders by the unique event_id; sumMap's
    keys are sorted; histogram's equi-width bins derive from exact
    min/max and integer-valued doubles."""
    return _via_shim(spark, sf, ["events"], _Q180_CH)


_Q180_ORACLE = r"""
WITH e AS (
  SELECT event_type, value AS v, user_id % 100 AS s,
         -- trunc first: DuckDB's double->BIGINT cast ROUNDS while
         -- Spark's (and ClickHouse toInt64's) truncates toward zero
         CAST(trunc(value) AS BIGINT) AS dv, event_id AS t,
         'k' || CAST(user_id % 3 AS VARCHAR) AS mk,
         t % 100 AS mv,
         user_id % 7 AS a1, event_id % 5 AS a2,
         CAST(user_id % 89 AS DOUBLE) AS hx
  FROM events
), ils AS (  -- union length: merge fold over (start, end) sorted rows
  SELECT event_type, sum(CASE WHEN pe IS NULL OR v > pe THEN 5.0
                              ELSE greatest(v + 5 - pe, 0.0) END) AS ils
  FROM (SELECT event_type, v,
               max(v + 5) OVER (PARTITION BY event_type ORDER BY v, v + 5
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS pe
        FROM e)
  GROUP BY event_type
), mi AS (  -- sweep: ends (-1) before starts (+1) at equal positions
  SELECT event_type, max(run) AS mi
  FROM (SELECT event_type,
               sum(d) OVER (PARTITION BY event_type ORDER BY p, d
                            ROWS UNBOUNDED PRECEDING) AS run
        FROM (SELECT event_type, s AS p, 1 AS d FROM e
              UNION ALL
              SELECT event_type, s + 10 AS p, -1 AS d FROM e))
  GROUP BY event_type
), dst AS (
  SELECT event_type,
         CAST(sum(CASE WHEN dv > pv THEN dv - pv ELSE 0 END) AS BIGINT) AS dst
  FROM (SELECT event_type, dv,
               lag(dv) OVER (PARTITION BY event_type ORDER BY t) AS pv
        FROM e)
  GROUP BY event_type
), sm AS (
  SELECT event_type,
         string_agg(mk, ',' ORDER BY mk) AS smk,
         string_agg(CAST(msum AS VARCHAR), ',' ORDER BY mk) AS smv
  FROM (SELECT event_type, mk, CAST(sum(mv) AS BIGINT) AS msum
        FROM e GROUP BY event_type, mk)
  GROUP BY event_type
), ua AS (
  SELECT event_type, CAST(count(DISTINCT x) AS BIGINT) AS ua
  FROM (SELECT event_type, a1 AS x FROM e
        UNION ALL SELECT event_type, a2 FROM e)
  GROUP BY event_type
), hb AS (
  SELECT event_type, min(hx) AS lo, (max(hx) - min(hx)) / 4 AS w
  FROM e GROUP BY event_type
), hbin AS (
  SELECT hb.event_type, b.i,
         hb.lo + (b.i - 1) * hb.w AS lower,
         hb.lo + b.i * hb.w AS upper,
         (SELECT CAST(count(*) AS DOUBLE) FROM e
          WHERE e.event_type = hb.event_type
            AND e.hx >= hb.lo + (b.i - 1) * hb.w
            AND (e.hx < hb.lo + b.i * hb.w OR b.i = 4)) AS height
  FROM hb, (SELECT unnest(generate_series(1, 4)) AS i) b
), hist AS (
  SELECT event_type,
         string_agg(CAST(CAST(round(lower * 1000) AS BIGINT) AS VARCHAR),
                    ',' ORDER BY i) AS hlo,
         string_agg(CAST(CAST(round(upper * 1000) AS BIGINT) AS VARCHAR),
                    ',' ORDER BY i) AS hhi,
         string_agg(CAST(CAST(height AS BIGINT) AS VARCHAR),
                    ',' ORDER BY i) AS hct
  FROM hbin GROUP BY event_type
)
SELECT ils.event_type AS event_type,
       round(ils.ils, 6) AS ils,
       CAST(mi.mi AS BIGINT) AS mi,
       dst.dst AS dst,
       sm.smk AS smk, sm.smv AS smv,
       ua.ua AS ua,
       hist.hlo AS hlo, hist.hhi AS hhi, hist.hct AS hct
FROM ils
JOIN mi USING (event_type)
JOIN dst USING (event_type)
JOIN sm USING (event_type)
JOIN ua USING (event_type)
JOIN hist USING (event_type)
ORDER BY event_type
"""

SPECS.append(QuerySpec(
    "q180_dialect_fold_aggs",
    "intervalLengthSum/maxIntersections/deltaSumTimestamp/sumMap/"
    "uniqArray/histogram — through the shim",
    _q180_dialect_fold_aggs,
    _Q180_ORACLE,
))


# ------------------------------------------- q181 KS + meanZ dialect
_Q181_CH = """
SELECT round(tupleElement(kolmogorovSmirnovTest(value, user_id % 2), 1), 6) AS ks_d,
       round(tupleElement(kolmogorovSmirnovTest(value, user_id % 2), 2), 4) AS ks_p,
       round(tupleElement(meanZTest(9000.0, 9000.0, 0.95)(value, user_id % 2), 1), 4) AS mz,
       round(tupleElement(meanZTest(9000.0, 9000.0, 0.95)(value, user_id % 2), 2), 4) AS mzp
FROM events
WHERE event_id % 11 = 0
ORDER BY ks_d
"""


def _q181_dialect_ks_meanz(spark: SparkSession, sf: str) -> DataFrame:
    """kolmogorovSmirnovTest + meanZTest through the shim on a
    deterministic 1-in-11 sample (KS folds the pooled sorted sample
    per group — the q114 value-grouped operator is the full-scale
    path).  The KS p uses the asymptotic Kolmogorov first term and
    meanZTest's p the shared erf polynomial; both oracles inline the
    identical formulas, doubles rounded per the q85 precedent."""
    return _via_shim(spark, sf, ["events"], _Q181_CH)


_Q181_ORACLE = rf"""
WITH s AS (
  SELECT value AS v, user_id % 2 AS g FROM events WHERE event_id % 11 = 0
), n AS (
  SELECT count(*) FILTER (g = 0)::DOUBLE AS n0,
         count(*) FILTER (g = 1)::DOUBLE AS n1,
         avg(v) FILTER (g = 0) AS m0, avg(v) FILTER (g = 1) AS m1
  FROM s
), steps AS (
  SELECT abs(
           (sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)
              OVER (ORDER BY v, g ROWS UNBOUNDED PRECEDING))
             / (SELECT n1 FROM n)
         - (sum(CASE WHEN g = 0 THEN 1 ELSE 0 END)
              OVER (ORDER BY v, g ROWS UNBOUNDED PRECEDING))
             / (SELECT n0 FROM n)) AS gap
  FROM s
), ks AS (
  SELECT max(gap) AS d FROM steps
)
SELECT round(ks.d, 6) AS ks_d,
       round(least(1.0, 2.0 * exp(-2.0 * pow(ks.d
             * sqrt(n.n0 * n.n1 / (n.n0 + n.n1)), 2))), 4) AS ks_p,
       round((n.m0 - n.m1) / sqrt(9000.0 / n.n0 + 9000.0 / n.n1), 4) AS mz,
       round(1.0 - {_duck_erf('(abs((n.m0 - n.m1) / sqrt(9000.0 / n.n0 + 9000.0 / n.n1)) / sqrt(2.0))')}, 4) AS mzp
FROM ks, n
ORDER BY ks_d
"""

SPECS.append(QuerySpec(
    "q181_dialect_ks_meanz",
    "kolmogorovSmirnovTest + meanZTest — through the shim",
    _q181_dialect_ks_meanz,
    _Q181_ORACLE,
))


# --------------------------------------------- q183 string similarity
_Q183_CH = """
SELECT toInt64(count())                                           AS n,
       round(avg(round(jaroSimilarity(a, b), 6)), 4)              AS jaro_avg,
       round(min(jaroSimilarity(a, b)), 6)                        AS jaro_min,
       round(avg(round(jaroWinklerSimilarity(a, b), 6)), 4)       AS jw_avg,
       round(max(jaroWinklerSimilarity(a, b)), 6)                 AS jw_max,
       toInt64(sum(editDistance(a, b)))                           AS lev_sum
FROM (
  SELECT a, b FROM (
    SELECT c1.c_name AS a, c2.c_name AS b
    FROM customer c1 INNER JOIN customer c2 ON c2.c_custkey = c1.c_custkey + 1
  ) WHERE jaroSimilarity(a, b) > 0.805
)
"""


def _q183_dialect_strsim(spark: SparkSession, sf: str) -> DataFrame:
    """The round-8 string-similarity surface (exact Jaro /
    Jaro-Winkler codegen expressions + editDistance) proven against
    DuckDB's NATIVE jaro_similarity / jaro_winkler_similarity /
    levenshtein over adjacent-customer-name pairs.

    The ``> 0.805`` filter pins the pair set to the regime where the
    two Winkler conventions coincide: the shim applies the 0.1 prefix
    bonus unconditionally (the ClickHouse convention), DuckDB only
    above its 0.7 boost threshold — above the cut both apply it.  The
    cut itself is robust: Jaro values are rationals with denominators
    dividing 3·|a|·|b|·m, so at customer-name lengths (~18 chars) two
    distinct values — and hence any value and the cut — are separated
    by at least ~2.9e-7 (1 / (3·|a|·|b|·m) worst case); an engine-side
    1e-16 difference can never flip a pair across the filter.  Per-pair doubles round to 6 before the averages (sum
    order cannot leak into the hash); the join is a 1-row-offset
    self-equi-join (broadcast at this dimension size, co-located at
    scale).

    The exact Jaro/JW codegen expressions are the per-row cost here, so
    the customer view registers through ``ensure_parallelism`` — the
    fixture's single-row-group scan would otherwise evaluate every pair
    on one core (measured 2.1 s of 1-task executor time at sf0.1)."""
    return _via_shim(spark, sf, ["customer"], _Q183_CH, parallel=["customer"])


_Q183_ORACLE = r"""
WITH p AS (
  SELECT c1.c_name AS a, c2.c_name AS b
  FROM customer c1 JOIN customer c2 ON c2.c_custkey = c1.c_custkey + 1
), f AS (
  SELECT a, b FROM p WHERE jaro_similarity(a, b) > 0.805
)
SELECT CAST(count(*) AS BIGINT)                                    AS n,
       round(avg(round(jaro_similarity(a, b), 6)), 4)              AS jaro_avg,
       round(min(jaro_similarity(a, b)), 6)                        AS jaro_min,
       round(avg(round(jaro_winkler_similarity(a, b), 6)), 4)      AS jw_avg,
       round(max(jaro_winkler_similarity(a, b)), 6)                AS jw_max,
       CAST(sum(levenshtein(a, b)) AS BIGINT)                      AS lev_sum
FROM f
"""

SPECS.append(QuerySpec(
    "q183_dialect_strsim",
    "jaroSimilarity / jaroWinklerSimilarity / editDistance vs DuckDB "
    "natives — through the shim",
    _q183_dialect_strsim,
    _Q183_ORACLE,
))


# ------------------------------------- q186 2-arg arrayResize defaults
_Q186_CH = """
SELECT vec_id,
       toInt64(countEqual(arrayResize(embedding, toInt32(64 + vec_id % 9)), 0)) AS n_pad_f,
       toInt64(arraySum(arrayResize([1, 2], toInt32(4 + vec_id % 3))))          AS s_int,
       round(arraySum(arrayResize([0.25], toInt32(3 + vec_id % 4))), 6)         AS s_float,
       arrayStringConcat(arrayResize(['a', 'b'], toInt32(3 + vec_id % 2)), '|') AS s_str,
       toInt64(arraySum(arrayShiftLeft([3, 4, 5], toInt32(1 + vec_id % 2))))    AS s_shift
FROM embeddings
WHERE vec_id % 7 = 0
ORDER BY vec_id
"""


def _q186_dialect_array_defaults(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse's 2-arg ``arrayResize``/``arrayShiftLeft`` forms,
    which pad with the ELEMENT TYPE'S DEFAULT — the round-8 verdict's
    curated-raise closure: the fill is now inferred for array literals
    (element type known lexically: Int → 0, Float → 0.0, String → '')
    and for cataloged columns (``column_types=`` lookup; here the
    ``embedding ARRAY<FLOAT>`` column pads with 0.0f, surfaced as the
    ``countEqual(..., 0)`` of the resized vector — the fixture
    embeddings contain no natural zeros, so the count IS the pad
    width).  Opaque array expressions still raise with the
    explicit-fill guidance.  Map-only projection: no exchange before
    the presentation sort."""
    return _via_shim(
        spark,
        sf,
        ["embeddings"],
        _Q186_CH,
        column_types={"embedding": "ARRAY<FLOAT>"},
    )


#: DuckDB 1.0.0's list_resize crashes (std::bad_array_new_length) on
#: non-constant sizes over some vector layouts, so the oracle spells
#: the pad out as list_concat + a range-generated default list.
_Q186_ORACLE = r"""
SELECT vec_id,
       CAST(len(list_filter(
              list_concat(embedding,
                          list_transform(range(vec_id % 9), i -> 0.0)),
              x -> x = 0)) AS BIGINT)                                          AS n_pad_f,
       CAST(list_sum(
              list_concat([1, 2],
                          list_transform(range(2 + vec_id % 3), i -> 0)))
            AS BIGINT)                                                         AS s_int,
       round(CAST(list_sum(
              list_concat([0.25],
                          list_transform(range(2 + vec_id % 4), i -> 0.0)))
             AS DOUBLE), 6)                                                    AS s_float,
       array_to_string(
              list_concat(['a', 'b'],
                          list_transform(range(1 + vec_id % 2), i -> '')),
              '|')                                                             AS s_str,
       CAST(list_sum(([3, 4, 5])[(1 + vec_id % 2) + 1 :]) AS BIGINT)           AS s_shift
FROM embeddings
WHERE vec_id % 7 = 0
ORDER BY vec_id
"""

SPECS.append(QuerySpec(
    "q186_dialect_array_defaults",
    "2-arg arrayResize / arrayShiftLeft type-default padding: literal "
    "Int/Float/String inference + cataloged-column lookup",
    _q186_dialect_array_defaults,
    _Q186_ORACLE,
))


# ----------------------------------------------- q187 ASOF JOIN
_Q187_CH = """
WITH p AS (SELECT user_id, event_id FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, event_id, value FROM events WHERE event_type = 'click')
SELECT p2.user_id AS uid,
       p2.event_id AS eid,
       c2.event_id AS prior_click,
       round(c2.value, 4) AS prior_value
FROM p AS p2 ASOF LEFT JOIN c AS c2
  ON p2.user_id = c2.user_id AND p2.event_id >= c2.event_id
ORDER BY uid, eid
"""


def _q187_dialect_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse ``ASOF LEFT JOIN`` through the dialect shim: each
    purchase picks the user's latest click at-or-before it (the
    canonical ClickHouse ASOF use, docs sql-reference/statements/
    select/join#asof-join-usage) — oracled against DuckDB's NATIVE
    ``ASOF LEFT JOIN``, so both the pick semantics (max right value
    satisfying the single inequality) and the unmatched-row NULL leg
    are engine-cross-checked.

    The shim rewrite (functions/dialect.py:_rewrite_asof_join) takes
    the BOUNDED path for this plain-column ON: tag both sides, UNION
    ALL, one running ``last_value(…, true)`` window per user ordered
    by (event_id, side) — the same shape as the engine's native as-of
    operator (relational.py:_q31_asof).  NO join operator in the
    plan, O(1) state per row: a hot user holding millions of clicks
    streams instead of fanning out (the fan-out equi-join + top-1
    shape remains only as the general-expression fallback, and
    ``EXPLAIN SYNTAX`` shows which shape a query took).  (user_id,
    event_id) is unique in the fixture, so the pick is deterministic."""
    return _via_shim(spark, sf, ["events"], _Q187_CH)


_Q187_ORACLE = r"""
WITH p AS (SELECT user_id, event_id FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, event_id, value FROM events WHERE event_type = 'click')
SELECT p.user_id AS uid,
       p.event_id AS eid,
       c.event_id AS prior_click,
       round(c.value, 4) AS prior_value
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.event_id >= c.event_id
ORDER BY uid, eid
"""

SPECS.append(QuerySpec(
    "q187_dialect_asof_join",
    "ClickHouse ASOF LEFT JOIN through the shim (equi-join + "
    "WindowGroupLimit top-1) vs DuckDB's native ASOF JOIN",
    _q187_dialect_asof_join,
    _Q187_ORACLE,
))


# ----------------------------------------------- q188 ANY JOIN
_Q188_CH = """
WITH p AS (SELECT user_id, event_id FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, event_id, value FROM events WHERE event_type = 'click')
SELECT p2.user_id AS uid,
       p2.event_id AS eid,
       c2.event_id AS any_click,
       round(c2.value, 4) AS any_value
FROM p AS p2 ANY LEFT JOIN c AS c2 ON p2.user_id = c2.user_id
ORDER BY uid, eid
"""


def _q188_dialect_any_join(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse ``ANY LEFT JOIN`` through the dialect shim: each
    purchase joins AT MOST ONE click of its user (docs sql-reference/
    statements/select/join#any-strictness).  ClickHouse's pick among a
    user's clicks is arbitrary; the translation
    (functions/dialect.py:_rewrite_any_join) pins it to the
    lexicographically smallest right row — here the lowest event_id,
    since event_id is unique — so the oracle can assert the exact
    rows, not just the multiplicity.

    Scale shape: the right side collapses to one row per user BEFORE
    the join (min(struct) — partial/final aggregate, map-side
    combine), so the join input is key-cardinality and can never fan
    out; the opposite of join-then-rank."""
    return _via_shim(spark, sf, ["events"], _Q188_CH)


_Q188_ORACLE = r"""
WITH p AS (SELECT user_id, event_id FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, event_id, value FROM events WHERE event_type = 'click'),
c1 AS (
  -- the translation's pick: lexicographic min over (user_id, event_id,
  -- value); event_id is unique per user, so ORDER BY event_id decides
  SELECT user_id, event_id, value FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY event_id, value) AS rn FROM c)
  WHERE rn = 1)
SELECT p.user_id AS uid,
       p.event_id AS eid,
       c1.event_id AS any_click,
       round(c1.value, 4) AS any_value
FROM p LEFT JOIN c1 USING (user_id)
ORDER BY uid, eid
"""

SPECS.append(QuerySpec(
    "q188_dialect_any_join",
    "ClickHouse ANY LEFT JOIN through the shim: right side deduped "
    "per key pre-join (pinned lexicographic-min pick), no fan-out",
    _q188_dialect_any_join,
    _Q188_ORACLE,
))


# ----------------------------------------------- q189 FULL ANY JOIN
_Q189_CH = """
WITH p AS (SELECT user_id, event_id, value FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, event_id, value FROM events WHERE event_type = 'click')
SELECT p2.user_id AS p_uid,
       p2.event_id AS p_eid,
       c2.user_id AS c_uid,
       c2.event_id AS c_eid,
       round(coalesce(p2.value, 0) + coalesce(c2.value, 0), 4) AS combined
FROM p AS p2 FULL ANY JOIN c AS c2 ON p2.user_id = c2.user_id
ORDER BY coalesce(p2.user_id, c2.user_id), p_eid, c_eid
"""


def _q189_dialect_full_any_join(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse ``FULL ANY JOIN`` through the dialect shim (round-10
    verdict ask #2), at ClickHouse's legacy
    ``any_join_distinct_right_table_keys=1`` semantics — the only mode
    in which ClickHouse accepts the form: EVERY purchase row survives
    with at most one click of its user (the click side — and only the
    click side — dedupes to key cardinality pre-join,
    ``min(struct(*))`` per user with the pick pinned to the lowest
    event_id), and each user with clicks but NO purchases appears
    once with NULL purchase legs.  Purchase-row multiplicity is never
    changed (functions/dialect.py:_rewrite_any_join FULL branch).

    Scale shape: one map-side-combining aggregate + a FULL join whose
    right input is key cardinality — a hot user's million clicks
    collapse before the join, never fan out across their purchases."""
    return _via_shim(spark, sf, ["events"], _Q189_CH)


_Q189_ORACLE = r"""
WITH p AS (SELECT user_id, event_id, value FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, event_id, value FROM events WHERE event_type = 'click'),
c1 AS (
  SELECT user_id, event_id, value FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY event_id, value) AS rn FROM c)
  WHERE rn = 1)
SELECT p.user_id AS p_uid,
       p.event_id AS p_eid,
       c1.user_id AS c_uid,
       c1.event_id AS c_eid,
       round(coalesce(p.value, 0) + coalesce(c1.value, 0), 4) AS combined
FROM p FULL JOIN c1 ON p.user_id = c1.user_id
ORDER BY coalesce(p.user_id, c1.user_id), p_eid, c_eid
"""

SPECS.append(QuerySpec(
    "q189_dialect_full_any_join",
    "ClickHouse FULL ANY JOIN through the shim (legacy semantics): "
    "all left rows, right side deduped per key (pinned pick), "
    "unmatched right keys once",
    _q189_dialect_full_any_join,
    _Q189_ORACLE,
))


# ----------------------------------------------- q190 ASOF USING
_Q190_CH = """
WITH p AS (SELECT user_id, event_id FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, event_id, value FROM events WHERE event_type = 'click')
SELECT p2.user_id AS uid,
       p2.event_id AS eid,
       c2.event_id AS prior_click,
       round(c2.value, 4) AS prior_value
FROM p AS p2 ASOF LEFT JOIN c AS c2 USING (user_id, event_id)
ORDER BY uid, eid
"""


def _q190_dialect_asof_using(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse ``ASOF LEFT JOIN … USING (k, ts)`` through the shim
    (round-10 verdict ask #2): USING desugars to the ON form — every
    column but the last is a plain equality, the LAST column is the
    closest-match inequality ``l.ts >= r.ts`` (docs
    join#asof-join-usage) — and then the BOUNDED union + running
    last_value translation fires, same as q187: NO join operator in
    the plan, one exchange per side, O(1) window state per row.

    The oracle runs DuckDB's NATIVE ASOF LEFT JOIN on the equivalent
    ON spelling, so the desugar's column-role convention (last =
    inequality) is engine-cross-checked end to end."""
    return _via_shim(spark, sf, ["events"], _Q190_CH)


SPECS.append(QuerySpec(
    "q190_dialect_asof_using",
    "ClickHouse ASOF JOIN USING desugared to ON (last column = the "
    "closest-match inequality), then the bounded no-join translation",
    _q190_dialect_asof_using,
    _Q187_ORACLE,
))
