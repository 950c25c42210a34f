"""Property test: the dialect's ASOF JOIN translation must agree with
a direct Python model of ClickHouse's semantics (for each left row,
the right row with the maximal right-side value satisfying the single
inequality within equal keys; LEFT keeps unmatched rows with NULLs;
duplicate left rows each keep their own match) on random tables."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from substreams_sink_clickhouse_spark.functions.dialect import (
    clickhouse_to_spark_sql,
)

_ROW_A = st.tuples(st.integers(0, 3), st.integers(0, 20))
_ROW_B = st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(0, 99))


def _model(a_rows, b_rows, op, left):
    out = []
    for k, t in a_rows:
        cands = [
            (bt, v)
            for bk, bt, v in b_rows
            if bk == k
            and ((op == ">=" and bt <= t) or (op == ">" and bt < t))
        ]
        if cands:
            # max right-side value; among ties on bt the translation
            # PINS the pick to the lexicographically smallest right
            # row — full struct (k, bt, v), so min v decides
            bt = max(bt for bt, _ in cands)
            v = min(v for cbt, v in cands if cbt == bt)
            out.append((k, t, bt, v))
        elif left:
            out.append((k, t, None, None))
    return sorted(out, key=lambda r: (r[0], r[1], r[2] is None, r[2] or 0, r[3] or 0))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(_ROW_A, min_size=1, max_size=8),
    st.lists(_ROW_B, min_size=0, max_size=8),
    st.sampled_from([">=", ">"]),
    st.booleans(),
)
def test_asof_translation_matches_model(spark, a_rows, b_rows, op, left):
    # duplicate (k, t) right rows stay IN: the translation pins the
    # tie pick to the lexicographic-min right row (round-10 advisory),
    # so the property covers it instead of dodging it
    spark.createDataFrame(a_rows, "k int, t int").createOrReplaceTempView("pa_t")
    (spark.createDataFrame(b_rows, "k int, t int, v int")
        .createOrReplaceTempView("pb_t"))
    kw = "ASOF LEFT JOIN" if left else "ASOF JOIN"
    expect = _model(a_rows, b_rows, op, left)
    key = lambda r: (r[0], r[1], r[2] is None, r[2] or 0, r[3] or 0)  # noqa: E731
    # plain-column ON -> bounded union+window path
    sql = clickhouse_to_spark_sql(
        f"SELECT a.k AS k, a.t AS t, b.t AS bt, b.v AS v "
        f"FROM pa_t a {kw} pb_t b ON a.k = b.k AND a.t {op} b.t"
    )
    assert "last_value" in sql and "__asof_rn" not in sql
    got = sorted([tuple(r) for r in spark.sql(sql).collect()], key=key)
    assert got == expect, (got, a_rows, b_rows, op, left)
    # expression ON (b.t + 0: same semantics) -> fan-out fallback path
    sql = clickhouse_to_spark_sql(
        f"SELECT a.k AS k, a.t AS t, b.t AS bt, b.v AS v "
        f"FROM pa_t a {kw} pb_t b ON a.k = b.k AND a.t {op} b.t + 0"
    )
    assert "__asof_rn" in sql
    got = sorted([tuple(r) for r in spark.sql(sql).collect()], key=key)
    assert got == expect, (got, a_rows, b_rows, op, left)
