"""Scale-hazard guards for the dedup path.

The degenerate-LSH hazard: a band value shared by a large fraction of
the corpus makes pair expansion quadratic inside one bucket/one task.
``MAX_BUCKET_SIZE`` is the cap (dedup.py) — these tests prove it
actually triggers on a degenerate corpus and that normal corpora are
unaffected.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import substreams_sink_clickhouse_spark.operators.dedup as dedup


@pytest.fixture()
def degenerate_docs(spark):
    """200 byte-identical documents: every minhash signature equal, so
    every band lands in ONE bucket of size 200 (19.9k pairs uncapped)."""
    return spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.lit("the same exact text repeated for every single document here").alias(
            "text"
        ),
    )


def _pairs_for(docs):
    bands = dedup._minhash_bands(docs)
    buckets = (
        bands.groupBy("band_id", "band_val")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    buckets = dedup._cap_buckets(buckets, "ids")
    return (
        buckets.select(
            F.explode(
                F.expr(dedup._pair_expand("ids", "x AS doc_a, y AS doc_b"))
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def test_degenerate_corpus_explodes_without_cap(spark, degenerate_docs):
    assert dedup.MAX_BUCKET_SIZE is None  # fixture default: no cap
    n = _pairs_for(degenerate_docs).count()
    assert n == 200 * 199 // 2  # quadratic pair expansion — the hazard


def test_max_bucket_size_caps_degenerate_buckets(spark, degenerate_docs):
    old = dedup.MAX_BUCKET_SIZE
    dedup.MAX_BUCKET_SIZE = 100
    try:
        n = _pairs_for(degenerate_docs).count()
    finally:
        dedup.MAX_BUCKET_SIZE = old
    # every bucket holds all 200 ids > cap -> dropped entirely; the
    # over-cap cluster is handled out-of-band (trivially "all dups")
    assert n == 0


def test_max_bucket_size_leaves_normal_buckets_alone(spark):
    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("completely different document number "),
            F.col("id").cast("string"),
            F.lit(" with its own words and structure entirely unique"),
        ).alias("text"),
    )
    # one near-dup pair: doc 1000 copies doc 0's text
    dup = spark.range(1).select(
        F.lit(1000).alias("doc_id"),
        F.lit(
            "completely different document number 0 with its own words and structure entirely unique"
        ).alias("text"),
    )
    corpus = docs.unionByName(dup)
    old = dedup.MAX_BUCKET_SIZE
    dedup.MAX_BUCKET_SIZE = 10
    try:
        pairs = {(r["doc_a"], r["doc_b"]) for r in _pairs_for(corpus).collect()}
    finally:
        dedup.MAX_BUCKET_SIZE = old
    assert (0, 1000) in pairs
