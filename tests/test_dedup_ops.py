"""Unit tests for the duplicate-clustering operator (connected
components over near-dup candidate pairs)."""

from pyspark.sql import functions as F

from substreams_sink_clickhouse_spark.operators.dedup import connected_components


def _components(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        r["doc_id"]: r["cluster_id"] for r in connected_components(df).collect()
    }


def test_chain_collapses_to_one_cluster(spark):
    # 1-2, 2-3, 3-4: transitive chain -> one cluster labeled 1
    out = _components(spark, [(1, 2), (2, 3), (3, 4)])
    assert out == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_clusters_stay_apart(spark):
    out = _components(spark, [(1, 2), (10, 11), (11, 12), (20, 21)])
    assert out == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_long_chain_needs_multiple_rounds(spark):
    # a path of length 9: label 0 must propagate 9 hops
    edges = [(i, i + 1) for i in range(9)]
    out = _components(spark, edges)
    assert set(out.values()) == {0}


def test_cluster_sizes_match_membership(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "doc_a long, doc_b long")
    comp = connected_components(df)
    sizes = (
        comp.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert {r["cluster_id"]: r["n"] for r in sizes} == {1: 3, 7: 2}


def test_shared_cores_match_uncached(spark):
    """The session-memoized cores (_shared_core: minhash signatures,
    shingle counts/common) must return exactly the frames a cold
    inline build would - caching is a materialization strategy, never
    a semantics change.  Also pins cache identity: a second call
    returns the same persisted DataFrame object."""
    from substreams_sink_clickhouse_spark.operators import dedup as D

    sf = "/root/testdata/sf0.001"
    sigs_cached = D._minhash_sigs_cached(spark, sf)
    sigs_cold = D._minhash_sigs(D._aug_docs(spark, sf))
    assert sorted(map(tuple, sigs_cached.collect())) == sorted(
        map(tuple, sigs_cold.collect())
    )
    counts_c, common_c = D._shingle_common_cached(spark, sf)
    counts_0, common_0 = D._shingle_common(D._aug_docs(spark, sf))
    assert sorted(map(tuple, counts_c.collect())) == sorted(
        map(tuple, counts_0.collect())
    )
    assert sorted(map(tuple, common_c.collect())) == sorted(
        map(tuple, common_0.collect())
    )
    assert D._minhash_sigs_cached(spark, sf) is sigs_cached
