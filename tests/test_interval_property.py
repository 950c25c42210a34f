"""Brute-force property tests for the interval aggregates: the
distributed gaps-and-islands / sweep implementations must agree with a
direct Python computation on arbitrary inputs — independent of the
DuckDB oracle (which shares the SQL formulation and could be
same-wrong)."""

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from substreams_sink_clickhouse_spark.operators.clickhouse_compat_ext3 import (
    interval_length_sum,
    max_intersections,
)

_IV = st.lists(
    st.tuples(st.integers(0, 30), st.integers(1, 10)), min_size=1, max_size=12
)


def _union_len(spans):
    covered = set()
    for s, w in spans:
        covered.update(range(s, s + w))
    return len(covered)


def _max_overlap(spans):
    return max(
        sum(1 for s, w in spans if s <= p < s + w)
        for p in range(0, 45)
    )


@given(a=_IV, b=_IV)
@settings(max_examples=10, deadline=None)
def test_interval_ops_match_bruteforce(spark, a, b):
    rows = [
        ("ka", i, s, s + w) for i, (s, w) in enumerate(a)
    ] + [("kb", i, s, s + w) for i, (s, w) in enumerate(b)]
    iv = spark.createDataFrame(rows, "k string, oid long, s long, e long")
    got_len = {r["k"]: r["union_len"] for r in interval_length_sum(iv).collect()}
    assert got_len == {"ka": _union_len(a), "kb": _union_len(b)}
    got_mi = {
        r["k"]: r["max_intersections"] for r in max_intersections(iv).collect()
    }
    assert got_mi == {"ka": _max_overlap(a), "kb": _max_overlap(b)}
