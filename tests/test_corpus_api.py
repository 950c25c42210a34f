"""The composable Corpus API must agree exactly with the oracle-
verified gate entries it packages (no second implementation to
drift)."""

from pyspark.sql import functions as F

from substreams_sink_clickhouse_spark.operators.corpus import Corpus
from substreams_sink_clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents")


def test_gopher_flags_match_gate(spark):
    from substreams_sink_clickhouse_spark.operators.text import _gopher_rules

    api = Corpus(_docs(spark)).gopher_flags().orderBy("doc_id").collect()
    gate = _gopher_rules(spark, SF).collect()
    assert api == gate


def test_minhash_pairs_match_gate(spark):
    from substreams_sink_clickhouse_spark.operators.dedup import (
        _aug_docs,
        _dedup_minhash,
    )

    api = {
        (r["doc_a"], r["doc_b"])
        for r in Corpus(_aug_docs(spark, SF)).minhash_dup_pairs().collect()
    }
    gate = {(r["doc_a"], r["doc_b"]) for r in _dedup_minhash(spark, SF).collect()}
    assert api == gate and api


def test_split_matches_gate_counts(spark):
    from substreams_sink_clickhouse_spark.operators.training import _train_split

    api = {
        r["split"]: r["n"]
        for r in Corpus(_docs(spark))
        .split()
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    gate = {r["split"]: r["n_docs"] for r in _train_split(spark, SF).collect()}
    assert api == gate


def test_card_matches_gate(spark):
    from substreams_sink_clickhouse_spark.operators.text import _corpus_card

    api = Corpus(_docs(spark)).card().collect()[0].asDict()
    gate = _corpus_card(spark, SF).collect()[0].asDict()
    for k, v in gate.items():
        assert api[k] == v, (k, api[k], v)


def test_fluent_pipeline_and_custom_columns(spark):
    df = _docs(spark).withColumnRenamed("doc_id", "id").withColumnRenamed(
        "text", "body"
    )
    c = Corpus(df, id_col="id", text_col="body")
    n0 = c.count()
    exact = c.dedup_exact()
    assert exact.count() <= n0
    cleaned = exact.dedup_minhash()
    assert cleaned.count() <= exact.count()
    # filters keep ride-along columns
    assert "lang" in cleaned.df.columns
    # exact dedup keeps the LOWEST id per duplicated text
    dupes = (
        df.groupBy("body").agg(F.count(F.lit(1)).alias("n"), F.min("id").alias("lo"))
        .filter("n > 1")
        .collect()
    )
    kept_ids = {r["doc_id"] for r in exact.df.select("doc_id").collect()}
    for r in dupes:
        assert r["lo"] in kept_ids


def test_split_thresholds_round_not_truncate(spark):
    # train=0.29: int(0.29*100) truncates to 28 under binary float;
    # the boundary must sit at percentile 29 (round-2 advisory).
    from substreams_sink_clickhouse_spark.operators.corpus import Corpus

    df = spark.range(2000).selectExpr("CAST(id AS STRING) AS doc_id", "'x' AS text")
    got = (
        Corpus(df)
        .split(train=0.29, val=0.13)
        .groupBy("split")
        .count()
        .collect()
    )
    counts = {r["split"]: r["count"] for r in got}
    # hash buckets are ~uniform over 2000 ids; a 28-vs-29 boundary slip
    # shifts train by a full percentile (~20 docs); assert the fraction
    # is consistent with 29 buckets, not 28
    assert abs(counts["train"] / 2000 - 0.29) < 0.035
    assert abs((counts["train"] + counts["val"]) / 2000 - 0.42) < 0.035


def test_dedup_keep_best_keeps_highest_quality(spark):
    from pyspark.sql import functions as F

    from substreams_sink_clickhouse_spark.operators.corpus import Corpus

    # every word carries the doc index so the singletons share NO
    # shingles with each other (MinHash would otherwise cluster them)
    base = "alpha{0} beta{0} gamma{0} delta{0} epsilon{0} zeta{0} eta{0} theta{0}"
    rows = [(i, base.format(i) + " tail word") for i in range(20)]
    # a near-dup family: 100 is a longer (better) variant of 0, 101 a
    # truncated (worse) one
    rows.append((100, base.format(0) + " tail word extra quality tokens"))
    rows.append((101, base.format(0)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = Corpus(df).dedup_keep_best()
    kept = {r["doc_id"] for r in out.df.select("doc_id").collect()}
    assert 100 in kept            # best of the family survives
    assert 0 not in kept and 101 not in kept
    assert all(i in kept for i in range(1, 20))  # singletons untouched
    # custom quality column flips the winner
    out2 = Corpus(df).dedup_keep_best(quality=-F.length("text"))
    kept2 = {r["doc_id"] for r in out2.df.select("doc_id").collect()}
    assert 101 in kept2 and 100 not in kept2


def test_corpus_dedup_phash_keeps_one_per_hash(spark):
    docs_df = _docs(spark)
    from substreams_sink_clickhouse_spark.operators.corpus import Corpus
    from substreams_sink_clickhouse_spark.operators.multimodal import phash_assets
    from pyspark.sql import functions as F

    c = Corpus(docs_df)
    kept = c.dedup_phash().df
    # survivors' hashes are exactly the distinct hashes of the corpus
    assets = docs_df.select(
        F.col("doc_id").alias("asset_id"), F.encode("text", "utf-8").alias("payload")
    )
    n_hashes = phash_assets(assets).select("phash").distinct().count()
    assert kept.count() == n_hashes
    # idempotent
    assert c.dedup_phash().dedup_phash().count() == n_hashes


def test_corpus_interleave_matches_gate_shape(spark):
    docs_df = _docs(spark)
    from pyspark.sql import functions as F

    from substreams_sink_clickhouse_spark.operators.corpus import Corpus

    out = Corpus(docs_df).interleave(F.lit(1))
    n = docs_df.count()
    ranks = [r.interleave_rank for r in out.select("interleave_rank").collect()]
    assert sorted(ranks) == list(range(1, n + 1))


def test_corpus_scrub_pii(spark):
    from substreams_sink_clickhouse_spark.operators.corpus import Corpus

    df = spark.createDataFrame(
        [(1, "mail me at bob@example.com or 555-1234"), (2, "clean text")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.text, r.n_redactions) for r in Corpus(df).scrub_pii().df.collect()}
    assert out[1] == ("mail me at <EMAIL> or <PHONE>", 2)
    assert out[2] == ("clean text", 0)


def test_scrub_dup_spans_matches_gate_accounting(spark):
    """Corpus.scrub_dup_spans rebuilds cleaned text; its per-doc word
    counts must equal the dedup_span_scrub gate entry's words_after on
    the same corpus (same keep-first decision, case-insensitive hash,
    original case preserved in the output)."""
    from substreams_sink_clickhouse_spark.operators.dedup import (
        _aug_docs,
        _dedup_span_scrub,
    )

    aug = _aug_docs(spark, SF)
    cleaned = Corpus(aug).scrub_dup_spans().df
    got = cleaned.select(
        "doc_id",
        F.when(F.col("text") == "", 0)
        .otherwise(F.size(F.split("text", " ")))
        .alias("wa"),
    )
    want = _dedup_span_scrub(spark, SF).select("doc_id", "words_after")
    joined = got.join(want, "doc_id")
    assert joined.count() == want.count() == got.count()
    assert joined.filter(F.col("wa") != F.col("words_after")).count() == 0
    # scrubbing engaged: the near-dup copies lose their duplicated spans
    assert (
        got.agg(F.sum("wa")).collect()[0][0]
        < aug.select(F.size(F.split("text", " ")).alias("n")).agg(F.sum("n")).collect()[0][0]
    )


def test_corpus_export_shards(spark, tmp_path):
    """Size-capped shard export + manifest: per-shard row caps hold,
    the manifest's totals equal what landed on disk (counted by ONE
    distributed group-by-input-file job), and shard_by produces
    partition directories a trainer can mount in isolation."""
    import json
    import os

    from substreams_sink_clickhouse_spark.operators.corpus import Corpus

    df = spark.createDataFrame(
        [(i, f"doc {i}", "en" if i % 2 == 0 else "fr") for i in range(100)],
        "doc_id long, text string, lang string",
    ).coalesce(1)
    out = str(tmp_path / "shards")
    manifest = Corpus(df).export_shards(out, max_records_per_shard=30, fmt="jsonl")
    assert manifest["total_rows"] == 100
    assert manifest["n_shards"] >= 4  # 100 rows / cap 30
    assert all(s["rows"] <= 30 for s in manifest["shards"])
    assert all(s["bytes"] > 0 for s in manifest["shards"])
    on_disk = json.load(open(os.path.join(out, "_manifest.json")))
    assert on_disk == manifest
    # round-trip: the shards ARE the corpus
    assert spark.read.json(out).count() == 100

    # partitioned export: one directory per shard_by value
    out2 = str(tmp_path / "bylang")
    m2 = Corpus(df).export_shards(
        out2, max_records_per_shard=1000, fmt="parquet", shard_by="lang"
    )
    assert m2["total_rows"] == 100
    dirs = {d for d in os.listdir(out2) if d.startswith("lang=")}
    assert dirs == {"lang=en", "lang=fr"}
    # partition pruning: reading one subset sees only its rows
    assert spark.read.parquet(out2 + "/lang=en").count() == 50


def test_corpus_from_shards_roundtrip_and_validation(spark, tmp_path):
    import json
    import os

    from substreams_sink_clickhouse_spark.operators.corpus import Corpus

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    out = str(tmp_path / "rt")
    Corpus(df).export_shards(out, max_records_per_shard=15, fmt="jsonl")
    c = Corpus.from_shards(spark, out, validate=True)
    assert c.count() == 40
    # corrupt the manifest: validation must fail loudly
    mp = os.path.join(out, "_manifest.json")
    m = json.load(open(mp))
    m["total_rows"] += 1
    json.dump(m, open(mp, "w"))
    import pytest

    with pytest.raises(ValueError, match="truncated or"):
        Corpus.from_shards(spark, out, validate=True)


def test_longest_dup_spans_matches_gate_core(spark):
    """Corpus.longest_dup_spans over the augmented fixture equals the
    dedup_span_longest gate builder (same core, same parameters)."""
    from substreams_sink_clickhouse_spark.operators.corpus import Corpus
    from substreams_sink_clickhouse_spark.operators import dedup as D

    sf = "/root/testdata/sf0.001"
    via_api = Corpus(D._aug_docs(spark, sf)).longest_dup_spans()
    via_gate = D._dedup_span_longest(spark, sf)
    assert sorted(map(tuple, via_api.collect())) == sorted(
        map(tuple, via_gate.collect())
    )


def test_select_rho_loss_keeps_top_scorers(spark):
    """select_rho_loss keeps exactly the documents whose reducible
    loss reaches the percentile threshold; ties at the boundary stay
    in; the selection is map-only after one broadcast threshold."""
    from substreams_sink_clickhouse_spark.operators.corpus import Corpus

    # a user column named 't' pins the regression where the broadcast
    # threshold column's bare name collided with corpus columns
    rows = [
        (i, f"doc {i}", float(i), float(i % 10), float(i % 3))
        for i in range(100)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, t double, tl double, hl double"
    )
    kept = Corpus(df).select_rho_loss("tl", "hl", keep_pct=25).df
    got = {r["doc_id"] for r in kept.collect()}
    rhos = sorted(((i % 10) - (i % 3) for i in range(100)), reverse=True)
    thr_approx = rhos[24]  # exact percentile on this tiny frame
    expect = {i for i in range(100) if (i % 10) - (i % 3) >= thr_approx}
    assert got == expect
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan  # threshold broadcasts
