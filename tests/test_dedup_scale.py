"""Scale-hazard guards for the dedup path.

The degenerate-LSH hazard: a band value shared by a large fraction of
the corpus makes pair expansion quadratic inside one bucket/one task.
``MAX_BUCKET_SIZE`` is the cap (dedup.py), ON by default — over-cap
MinHash buckets collapse to linear star pairs against the bucket
representative (explicit "trivially-all-duplicate cluster" rows),
never a quadratic explosion and never a silent drop.  These tests
prove the default engages on a degenerate corpus, that star collapse
preserves dedup/cluster connectivity, and that normal corpora are
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
    return (
        dedup._pair_rows_capped(buckets, "ids")
        .select(F.col("x").alias("doc_a"), F.col("y").alias("doc_b"))
        .distinct()
    )


def test_cap_defaults_on():
    assert dedup.MAX_BUCKET_SIZE is not None
    assert dedup.MAX_BUCKET_SIZE >= 1000  # sane floor, not a toy value


def test_degenerate_corpus_explodes_with_cap_disabled(spark, degenerate_docs):
    old = dedup.MAX_BUCKET_SIZE
    dedup.MAX_BUCKET_SIZE = None
    try:
        n = _pairs_for(degenerate_docs).count()
    finally:
        dedup.MAX_BUCKET_SIZE = old
    assert n == 200 * 199 // 2  # quadratic pair expansion — the hazard


def test_over_cap_buckets_collapse_to_star_pairs(spark, degenerate_docs):
    old = dedup.MAX_BUCKET_SIZE
    dedup.MAX_BUCKET_SIZE = 100
    try:
        pairs = {(r["doc_a"], r["doc_b"]) for r in _pairs_for(degenerate_docs).collect()}
    finally:
        dedup.MAX_BUCKET_SIZE = old
    # the 200-doc bucket (> cap) emits exactly the 199 star pairs
    # (0, 1)..(0, 199): linear rows that keep the cluster connected
    # (dedup_clusters) and mark every non-representative a loser
    # (keep-first dedup) — identical downstream semantics, O(n) cost
    assert pairs == {(0, i) for i in range(1, 200)}


def test_default_cap_engages_above_threshold(spark):
    """A corpus 1 past the DEFAULT cap collapses to star pairs without
    any override — the guard must protect real runs, not only tests."""
    n_docs = dedup.MAX_BUCKET_SIZE + 1
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.lit("identical text shared by every document in this corpus run").alias(
            "text"
        ),
    )
    n = _pairs_for(docs).count()
    assert n == n_docs - 1  # star pairs, not n*(n-1)/2


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


def test_oracle_mirrors_star_collapse(spark):
    """The DuckDB pairs CTE bakes the same cap rule: run both sides on
    a degenerate corpus ABOVE the cap and compare pair sets exactly."""
    import duckdb

    old = dedup.MAX_BUCKET_SIZE
    dedup.MAX_BUCKET_SIZE = 20
    try:
        docs = spark.range(50).select(
            F.col("id").alias("doc_id"),
            F.lit("same words in every doc of this tiny degenerate corpus").alias(
                "text"
            ),
        )
        got = {(r["doc_a"], r["doc_b"]) for r in _pairs_for(docs).collect()}
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW aug AS SELECT range AS doc_id, "
            "'same words in every doc of this tiny degenerate corpus' AS text "
            "FROM range(50)"
        )
        sql = f"""
WITH {dedup._minhash_band_ctes().lstrip().lstrip(',').strip()},
{dedup._duck_pairs_cte().strip()}
SELECT doc_a, doc_b FROM pairs ORDER BY 1, 2
"""
        # _minhash_band_ctes starts with the sh CTE body (follows a
        # WITH in callers); prepend WITH directly
        want = {tuple(r) for r in con.execute(sql).fetchall()}
    finally:
        dedup.MAX_BUCKET_SIZE = old
    assert got == want
    assert got == {(0, i) for i in range(1, 50)}


def _hof_pair_expand_reference(arr: str, cap: int | None) -> str:
    """The pre-round-12 interpreted HOF pair expansion, kept as the
    value reference for the Generate-based enumerator that replaced
    it (``_pair_rows`` / ``_pair_rows_capped``)."""
    base = (
        f"flatten(transform({arr}, (x, i) -> "
        f"transform(filter(slice({arr}, i + 2, size({arr}) - i - 1), y -> y > x), "
        f"y -> struct(x AS doc_a, y AS doc_b))))"
    )
    if cap is None:
        return base
    return (
        f"CASE WHEN size({arr}) <= {cap} THEN {base} "
        f"ELSE transform(slice({arr}, 2, size({arr}) - 1), "
        f"y -> struct(element_at({arr}, 1) AS doc_a, y AS doc_b)) END"
    )


def test_pair_rows_matches_interpreted_hof_reference(spark):
    """Round-12 rewrite pin: the Generate-based pair enumerator is
    MULTISET-identical (groupBy counts, not just the set) to the
    interpreted flatten/transform/filter/slice chain it replaced —
    including duplicate values inside a bucket, a bucket exactly at
    the cap, and the over-cap star branch."""
    old = dedup.MAX_BUCKET_SIZE
    dedup.MAX_BUCKET_SIZE = 4
    try:
        rows = [
            ([1, 2, 3],),            # plain under-cap
            ([5, 5, 7, 9],),         # duplicates, exactly at cap
            ([2, 4, 4, 6, 8],),      # over cap -> star pairs
            ([1, 1, 1, 1, 1, 1],),   # over cap, all-equal values
        ]
        buckets = spark.createDataFrame(rows, "ids: array<int>")
        got = sorted(
            ((r["doc_a"], r["doc_b"]), r["n"])
            for r in dedup._pair_rows_capped(buckets, "ids")
            .groupBy(F.col("x").alias("doc_a"), F.col("y").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        ref_sql = _hof_pair_expand_reference("ids", dedup.MAX_BUCKET_SIZE)
        want = sorted(
            ((r["p"]["doc_a"], r["p"]["doc_b"]), r["n"])
            for r in buckets.select(F.explode(F.expr(ref_sql)).alias("p"))
            .groupBy("p")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    finally:
        dedup.MAX_BUCKET_SIZE = old
    assert got == want
    # and the uncapped enumerator against the uncapped reference
    got_u = sorted(
        ((r["doc_a"], r["doc_b"]), r["n"])
        for r in dedup._pair_rows(buckets, "ids")
        .groupBy(F.col("x").alias("doc_a"), F.col("y").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want_u = sorted(
        ((r["p"]["doc_a"], r["p"]["doc_b"]), r["n"])
        for r in buckets.select(
            F.explode(F.expr(_hof_pair_expand_reference("ids", None))).alias("p")
        )
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert got_u == want_u


def test_pair_rows_plan_is_codegen_generate(spark):
    """The enumerator must plan as Generate nodes (codegen explode),
    not an interpreted higher-order expression."""
    buckets = spark.createDataFrame([([1, 2, 3],)], "ids: array<int>")
    plan = dedup._pair_rows_capped(buckets, "ids")._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in plan, plan[:2000]
    assert "flatten(transform" not in plan, plan[:2000]
