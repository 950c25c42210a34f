"""Execution profiles are a scheduling choice, not a semantics choice:
representative queries must return identical results on the adaptive
parent session and the interactive child session (AQE off, narrow
static shuffles), warm pool up on both.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from substreams_sink_clickhouse_spark.session import interactive_session
from substreams_sink_clickhouse_spark.sources.tables import warm_tables

SF = "/root/testdata/sf0.001"

#: One per plan family: agg, star join, outer join, window, correlated
#: subquery, JSON, session window, CDC kernel, minhash dedup, corpus
#: pipeline, PQ encode.
SAMPLE = [
    "q04_agg",
    "q07_star_join",
    "q08_outer_join",
    "q12_window_rank",
    "q16_correlated",
    "q22_json",
    "q24_session_window",
    "cdc_merge",
    "dedup_minhash",
    "corpus_prep",
    "sim_pq",
]


@pytest.fixture(scope="module")
def sessions(spark):
    inter = interactive_session(spark)
    warm_tables(spark, SF)
    warm_tables(inter, SF)
    return spark, inter


@pytest.mark.parametrize("name", SAMPLE)
def test_profile_parity(sessions, name):
    spark, inter = sessions
    qs = E.queries()
    a = sorted(map(str, qs[name](spark, SF).collect()))
    b = sorted(map(str, qs[name](inter, SF).collect()))
    assert a == b


def test_concurrent_submission_matches_sequential(sessions):
    """The concurrent bench mode is how a query server runs; results
    under 8-way thread interleaving must equal the sequential ones
    (shared SparkContext + buffer pool, per-thread Dataset builds)."""
    import concurrent.futures as cf

    spark, inter = sessions
    qs = E.queries()
    names = SAMPLE[:8]
    sequential = {
        n: sorted(map(str, qs[n](inter, SF).collect())) for n in names
    }

    def run(n):
        return n, sorted(map(str, qs[n](inter, SF).collect()))

    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        concurrent = dict(ex.map(run, names))
    assert concurrent == sequential
