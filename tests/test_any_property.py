"""Property test: the dialect's ANY JOIN translation must agree with a
direct Python model of the pinned semantics (for each left row, the
LEXICOGRAPHICALLY SMALLEST right row within equal keys — the
translation's deterministic refinement of ClickHouse's arbitrary
pick; LEFT keeps unmatched rows with NULLs, INNER drops them,
duplicate left rows each keep their own match) on random tables."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from substreams_sink_clickhouse_spark.functions.dialect import (
    clickhouse_to_spark_sql,
)

_ROW_A = st.tuples(st.integers(0, 3), st.integers(0, 20))
_ROW_B = st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(0, 99))


def _model(a_rows, b_rows, left):
    best = {}
    for bk, bt, v in b_rows:
        cand = (bt, v)
        if bk not in best or cand < best[bk]:
            best[bk] = cand
    out = []
    for k, t in a_rows:
        if k in best:
            out.append((k, t, best[k][0], best[k][1]))
        elif left:
            out.append((k, t, None, None))
    return sorted(
        out, key=lambda r: (r[0], r[1], r[2] is None, r[2] or 0, r[3] or 0)
    )


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(_ROW_A, min_size=1, max_size=8),
    st.lists(_ROW_B, min_size=0, max_size=8),
    st.booleans(),
)
def test_any_translation_matches_model(spark, a_rows, b_rows, left):
    spark.createDataFrame(a_rows, "k int, t int").createOrReplaceTempView("pany_a")
    (spark.createDataFrame(b_rows, "k int, t int, v int")
        .createOrReplaceTempView("pany_b"))
    kw = "ANY LEFT JOIN" if left else "ANY JOIN"
    sql = clickhouse_to_spark_sql(
        f"SELECT a.k AS k, a.t AS t, b.t AS bt, b.v AS v "
        f"FROM pany_a a {kw} pany_b b ON a.k = b.k"
    )
    assert "min(b)" in sql and "GROUP BY __any_k0" in sql
    got = sorted(
        [tuple(r) for r in spark.sql(sql).collect()],
        key=lambda r: (r[0], r[1], r[2] is None, r[2] or 0, r[3] or 0),
    )
    assert got == _model(a_rows, b_rows, left), (got, a_rows, b_rows, left)


def _model_full(a_rows, b_rows):
    # legacy any_join_distinct_right_table_keys=1 semantics: EVERY
    # left row survives with at most one (pinned lexicographic-min)
    # right match; each unmatched right KEY appears once, left legs
    # NULL.  Left multiplicity is never changed.
    bestb: dict = {}
    for k, bt, v in b_rows:
        if k not in bestb or (k, bt, v) < bestb[k]:
            bestb[k] = (k, bt, v)
    out = []
    for k, t in a_rows:
        rb = bestb.get(k)
        out.append((
            k, t,
            rb[0] if rb else None, rb[1] if rb else None,
            rb[2] if rb else None,
        ))
    akeys = {k for k, _ in a_rows}
    for k in sorted(set(bestb) - akeys):
        rb = bestb[k]
        out.append((None, None, rb[0], rb[1], rb[2]))
    return sorted(out, key=lambda r: tuple((x is None, x or 0) for x in r))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(_ROW_A, min_size=0, max_size=8),
    st.lists(_ROW_B, min_size=0, max_size=8),
)
def test_full_any_translation_matches_model(spark, a_rows, b_rows):
    """FULL ANY (legacy ClickHouse semantics, pinned): all left rows,
    right side deduped to key cardinality, unmatched right keys once
    with NULL left legs."""
    if not a_rows and not b_rows:
        return
    spark.createDataFrame(a_rows, "k int, t int").createOrReplaceTempView("pfany_a")
    (spark.createDataFrame(b_rows, "k int, t int, v int")
        .createOrReplaceTempView("pfany_b"))
    sql = clickhouse_to_spark_sql(
        "SELECT a.k AS ak, a.t AS at, b.k AS bk, b.t AS bt, b.v AS v "
        "FROM pfany_a a FULL ANY JOIN pfany_b b ON a.k = b.k"
    )
    assert "min(a)" not in sql  # the left side must NOT collapse
    assert "min(b)" in sql and "FULL JOIN" in sql
    got = sorted(
        [tuple(r) for r in spark.sql(sql).collect()],
        key=lambda r: tuple((x is None, x or 0) for x in r),
    )
    assert got == _model_full(a_rows, b_rows), (got, a_rows, b_rows)
