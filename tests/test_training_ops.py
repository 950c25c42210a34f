"""Invariants for the chunking and decontamination training-data ops
(value correctness is the DuckDB oracle gate; these check the
structural properties the oracle can't express)."""

from pyspark.sql import functions as F

from substreams_sink_clickhouse_spark.operators.dedup import _dedup_decontaminate
from substreams_sink_clickhouse_spark.operators.text import (
    CHUNK_STRIDE,
    CHUNK_WORDS,
    _chunk,
)
from substreams_sink_clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_chunks_cover_every_word(spark):
    docs = {
        r["doc_id"]: r["nw"]
        for r in load_table(spark, SF, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("nw"))
        .collect()
    }
    chunks = _chunk(spark, SF).collect()
    by_doc: dict = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        nw = docs[doc_id]
        rows.sort(key=lambda r: r["chunk_ix"])
        # Contiguous chunk indices from 0.
        assert [r["chunk_ix"] for r in rows] == list(range(len(rows)))
        # Every chunk is non-empty and at most CHUNK_WORDS words.
        assert all(1 <= r["n_chunk_words"] <= CHUNK_WORDS for r in rows)
        # Full coverage: the last window reaches the last word.
        last = rows[-1]
        assert last["chunk_ix"] * CHUNK_STRIDE + last["n_chunk_words"] == nw
        # Every window holds exactly the words its slice addresses.
        for r in rows:
            assert r["n_chunk_words"] == min(CHUNK_WORDS, nw - r["chunk_ix"] * CHUNK_STRIDE)


def test_decontaminate_excludes_benchmark_and_finds_planted(spark):
    flagged = {r["doc_id"] for r in _dedup_decontaminate(spark, SF).collect()}
    # Benchmark docs themselves are never in the output.
    assert all(d % 97 != 3 for d in flagged)
    # An exact copy of a benchmark doc must be flagged: verify via the
    # corpus itself — any corpus doc sharing a full text with a
    # benchmark doc shares all its shingles.
    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    bench_texts = {r["text"] for r in docs if r["doc_id"] % 97 == 3}
    copies = {r["doc_id"] for r in docs if r["doc_id"] % 97 != 3 and r["text"] in bench_texts}
    assert copies <= flagged


def test_repetition_signal_bounds_and_keep_flag(spark):
    from substreams_sink_clickhouse_spark.operators.text import _repetition

    rows = _repetition(spark, SF).collect()
    assert rows, "repetition signals must cover the corpus"
    for r in rows:
        assert r["n_tokens"] >= 2
        assert 0.0 <= r["word_rep"] <= 1.0
        assert 0.0 <= r["bigram_rep"] <= 1.0
        # A fully-distinct token list can't have repeated bigrams.
        if r["word_rep"] == 0.0:
            assert r["bigram_rep"] == 0.0
        assert r["keep"] == (r["word_rep"] <= 0.2)


def test_packing_bins_are_contiguous_and_budgeted(spark):
    from substreams_sink_clickhouse_spark.operators.text import _packing

    rows = _packing(spark, SF).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    n_docs_total = sum(r["n_docs"] for r in rows)
    n_docs_corpus = load_table(spark, SF, "documents").count()
    assert n_docs_total == n_docs_corpus
    for lang, bins in by_lang.items():
        bins.sort(key=lambda r: r["bin"])
        # Bins are contiguous from 0 (cumulative prefix can't skip one
        # unless a single doc spans multiple budgets, in which case the
        # skipped bin holds no doc start -- allow gaps only forward).
        assert bins[0]["bin"] == 0
        # Every bin except possibly the last one must have crossed its
        # 512-token budget boundary: a bin closes only when the running
        # total passes it, so cumulative tokens through bin k are > 512*k.
        cum = 0
        for r in bins[:-1]:
            cum += r["n_tokens"]
            assert cum > 512 * r["bin"]


def test_split_partitions_corpus(spark):
    from substreams_sink_clickhouse_spark.operators.training import _train_split

    rows = {r["split"]: r["n_docs"] for r in _train_split(spark, SF).collect()}
    total = load_table(spark, SF, "documents").count()
    # Every document lands in exactly one split.
    assert sum(rows.values()) == total
    assert set(rows) <= {"train", "val", "test"}
    # Hash carve should be roughly 80/10/10 (loose bound at sf0.001).
    assert rows["train"] > rows.get("val", 0)
    assert rows["train"] > rows.get("test", 0)


def test_upsample_multiplies_exactly(spark):
    from substreams_sink_clickhouse_spark.operators.training import _train_upsample

    rows = _train_upsample(spark, SF).collect()
    for r in rows:
        tier = int("".join(ch for ch in r["source"] if ch.isdigit())) % 3
        factor = 3 if tier == 0 else 1
        assert r["epoch_rows"] == factor * r["unique_docs"], r


def test_quantized_values_fit_int8(spark):
    from substreams_sink_clickhouse_spark.operators.training import _emb_quantize

    row = _emb_quantize(spark, SF).collect()[0]
    assert -127 <= row["q_min"] <= row["q_max"] <= 127
    assert row["worst_err"] >= row["avg_max_err"] >= 0.0


def test_interleave_prefix_carries_weight_proportions(spark):
    """The schedule property: any prefix of the interleaved order
    carries each source ~proportionally to its weight."""
    from pyspark.sql import functions as F

    from substreams_sink_clickhouse_spark.operators.training import (
        interleave_sources,
    )

    rows = [(i, f"s{i % 3}") for i in range(300)]  # 100 docs per source
    df = spark.createDataFrame(rows, "doc_id long, source string")
    weight = (
        F.when(F.col("source") == "s0", F.lit(3))
        .when(F.col("source") == "s1", F.lit(2))
        .otherwise(F.lit(1))
    )
    out = interleave_sources(df, weight, ["doc_id"])
    prefix = out.filter("interleave_rank <= 60").groupBy("source").count()
    counts = {r.source: r["count"] for r in prefix.collect()}
    # 60 slots at weights 3:2:1 -> 30/20/10
    assert counts == {"s0": 30, "s1": 20, "s2": 10}, counts
    # deterministic: same input -> same ranks
    again = interleave_sources(df, weight, ["doc_id"])
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_bpe_pair_counts_exact(spark):
    """BPE pair counting matches a hand-computed reference, including
    the end-of-word marker and frequency weighting."""
    from substreams_sink_clickhouse_spark.operators.text import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "ab ab ba"), (2, "ab b")], ["doc_id", "text"]
    )
    out = {r.pair: r.cnt for r in bpe_pair_counts(docs, top_k=10).collect()}
    # words: ab x3, ba x1, b x1 -> symbols ab_, ba_, b_
    assert out == {"ab": 3, "b_": 4, "ba": 1, "a_": 1}
    ranked = bpe_pair_counts(docs, top_k=2).collect()
    assert [(r.rank, r.pair) for r in ranked] == [(1, "b_"), (2, "ab")]


def test_corpus_bpe_pair_counts(spark):
    from substreams_sink_clickhouse_spark.operators.corpus import Corpus

    docs = spark.createDataFrame(
        [(1, "aa aa"), (2, "aa")], ["doc_id", "text"]
    )
    out = {r.pair: r.cnt for r in Corpus(docs).bpe_pair_counts().collect()}
    assert out == {"aa": 3, "a_": 3}


def test_bpe_merge_step_exact(spark):
    """One full BPE iteration against a hand computation: corpus
    'aab aab ab' learns merge a+b (weight-of-pairs: a+a:2, a+b:3,
    b+_:3), re-tokenizes to [a, ab, _] x2 / [ab, _], and iteration
    2's counts follow."""
    from substreams_sink_clickhouse_spark.operators.text import bpe_merge_step

    docs = spark.createDataFrame(
        [(1, "aab aab"), (2, "ab")], ["doc_id", "text"]
    )
    out = {r.pair: r.cnt for r in bpe_merge_step(docs, top_k=10).collect()}
    # merge 'a+b' (cnt 3 ties 'b+_' 3, pair asc wins); after merge:
    # aab_ -> [a, ab, _] (x2), ab_ -> [ab, _]
    assert out == {"a+ab": 2, "ab+_": 3}


def test_bpe_train_model_comparison(spark):
    """Multi-iteration BPE training vs an independent Python model:
    learned merge ORDER, winning counts, and the post-merge candidate
    distribution all match; the returned plan reads only the
    checkpointed vocabulary (no parquet/file scan — the corpus-scan
    count is independent of n_merges)."""
    import collections

    from substreams_sink_clickhouse_spark.operators.text import bpe_train

    corpus = [(1, "aab aab ab ba"), (2, "ab b aab"), (3, "bbb aab ba")]
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])

    # independent model (same rules: '_' marker, '+' pair identity,
    # left-to-right non-overlapping apply, cnt DESC / pair ASC ties)
    words = collections.Counter(
        w for _, t in corpus for w in t.split() if w.isalnum()
    )
    vocab = {tuple(w) + ("_",): f for w, f in words.items()}
    expect = []
    for step in range(1, 5):
        pc = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pc[syms[i] + "+" + syms[i + 1]] += f
        mx = max(pc.values())
        bp = min(p for p, n in pc.items() if n == mx)
        expect.append((step, bp, mx))
        left, right = bp.split("+")
        nxt = collections.Counter()
        for syms, f in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = out[-1] + s
                else:
                    out.append(s)
            nxt[tuple(out)] += f
        vocab = nxt
    post_pc = collections.Counter()
    for syms, f in vocab.items():
        for i in range(len(syms) - 1):
            post_pc[syms[i] + "+" + syms[i + 1]] += f

    result = bpe_train(docs, n_merges=4, post_top_k=5)
    rows = result.collect()
    got_merges = [(r.step, r.pair, r.cnt) for r in rows if r.step <= 4]
    assert got_merges == expect
    got_post = {r.pair: r.cnt for r in rows if r.step == 5}
    want_post = dict(
        sorted(post_pc.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    )
    assert got_post == want_post
    # scale contract: the output plan never rescans the corpus
    plan = result._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan and "Scan parquet" not in plan


def test_bpe_vocab_stats_and_corpus_wrappers(spark):
    """Encode-side token table: after merging 'a+b' etc., token counts
    match the final vocabulary's weighted symbols; the Corpus wrappers
    return the identical result."""
    from substreams_sink_clickhouse_spark.operators.corpus import Corpus
    from substreams_sink_clickhouse_spark.operators.text import (
        bpe_train,
        bpe_vocab_stats,
    )

    docs = spark.createDataFrame(
        [(1, "aab aab"), (2, "ab")], ["doc_id", "text"]
    )
    # merge 1 is a+b (cnt 3, pair asc beats b+_); with n_merges=1 the
    # vocabulary is aab_ -> [a, ab, _] x2, ab_ -> [ab, _]
    out = {r.token: r.cnt for r in bpe_vocab_stats(docs, n_merges=1, top_k=10).collect()}
    assert out == {"a": 2, "ab": 3, "_": 3}
    via_corpus = {
        r.token: r.cnt
        for r in Corpus(docs).bpe_vocab_stats(n_merges=1, top_k=10).collect()
    }
    assert via_corpus == out
    direct = [tuple(r) for r in bpe_train(docs, n_merges=2, post_top_k=3).collect()]
    wrapped = [tuple(r) for r in Corpus(docs).bpe_train(n_merges=2, post_top_k=3).collect()]
    assert direct == wrapped and direct[0][1] == "a+b"


def test_temperature_mix_upsamples_low_resource(spark):
    """Temperature sampling (tau=1/2): the low-resource language gets a
    HIGHER upsampling factor than the high-resource one, allocations
    sum to ~N, and the arithmetic matches the integer model."""
    import math

    from substreams_sink_clickhouse_spark.operators.training import (
        _train_temperature_mix,
    )

    rows = _train_temperature_mix(spark, "/root/testdata/sf0.001").collect()
    n = {r.lang: r.n for r in rows}
    up = {r.lang: r.upsample_pct for r in rows}
    tgt = {r.lang: r.target for r in rows}
    ntot = sum(n.values())
    stot = sum(math.floor(math.sqrt(v)) for v in n.values())
    for lang, v in n.items():
        s = math.floor(math.sqrt(v))
        assert tgt[lang] == (ntot * s) // stot
        assert up[lang] == (tgt[lang] * 100) // v
    hi = max(n, key=n.get)
    lo = min(n, key=n.get)
    assert up[lo] > up[hi]
    # allocations never exceed the corpus size and fill most of it
    assert sum(tgt.values()) <= ntot


def test_bpe_encode_model_comparison(spark):
    """Per-document encoding vs an independent Python BPE model: learn
    3 merges, tokenize every word, and compare per-doc word/token/
    symbol counts exactly.  Also asserts the Corpus wrapper agrees and
    that the token map reaches the corpus join as a broadcast."""
    import collections

    from substreams_sink_clickhouse_spark.operators.corpus import Corpus
    from substreams_sink_clickhouse_spark.operators.text import bpe_encode

    corpus = [(1, "aab aab ab ba"), (2, "ab b aab x!y"), (3, "bbb aab ba")]
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])

    words = collections.Counter(
        w for _, t in corpus for w in t.split() if w.isalnum()
    )
    vocab = {w: tuple(w) + ("_",) for w in words}
    for _ in range(3):
        pc = collections.Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[syms[i] + "+" + syms[i + 1]] += words[w]
        mx = max(pc.values())
        bp = min(p for p, n in pc.items() if n == mx)
        left, right = bp.split("+")
        for w, syms in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = out[-1] + s
                else:
                    out.append(s)
            vocab[w] = tuple(out)
    expect = {}
    for doc_id, t in corpus:
        ws = [w for w in t.split() if w.isalnum()]
        expect[doc_id] = (
            len(ws),
            sum(len(vocab[w]) for w in ws),
            sum(len(w) + 1 for w in ws),
        )

    result = bpe_encode(docs, n_merges=3)
    got = {r.doc_id: (r.n_words, r.n_tokens, r.n_syms0) for r in result.collect()}
    assert got == expect
    via_corpus = {
        r.doc_id: (r.n_words, r.n_tokens, r.n_syms0)
        for r in Corpus(docs).bpe_encode(n_merges=3).collect()
    }
    assert via_corpus == expect
    plan = result._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_bigram_logprob_hand_computed(spark):
    """Add-one-smoothed bigram scoring on a 2-doc fixture: per-lang
    mean/worst average log-probs match a hand computation with the
    exact (c(w1,w2)+1)/(c(w1)+V) formula over the same space-split
    token stream."""
    import math

    from substreams_sink_clickhouse_spark.operators import text as T

    corpus = [(1, "a b a b", "en"), (2, "a a b", "en"), (3, "b b", "fr")]

    # model: tokens are space-split (no filtering), V = distinct tokens
    uni = {}
    bigr = {}
    for _, t, _l in corpus:
        ws = t.split(" ")
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for i in range(len(ws) - 1):
            bigr[(ws[i], ws[i + 1])] = bigr.get((ws[i], ws[i + 1]), 0) + 1
    v = len(uni)
    per_doc = {}
    for doc_id, t, lang in corpus:
        ws = t.split(" ")
        lps = [
            math.log((bigr[(ws[i], ws[i + 1])] + 1) / (uni[ws[i]] + v))
            for i in range(len(ws) - 1)
        ]
        per_doc[doc_id] = (lang, round(sum(lps) / len(lps), 6))
    by_lang = {}
    for lang, lp in per_doc.values():
        by_lang.setdefault(lang, []).append(lp)
    expect = {
        lang: (len(lps), round(sum(lps) / len(lps), 4), round(min(lps), 4))
        for lang, lps in by_lang.items()
    }

    docs = spark.createDataFrame(corpus, ["doc_id", "text", "lang"])
    docs.createOrReplaceTempView("__bigram_fixture")

    # drive the gate function body on the fixture by monkeypatching the
    # loader boundary (the gate entry itself is oracle-checked; this
    # pins the arithmetic on a case small enough to verify by hand)
    orig = T.load_table
    try:
        T.load_table = lambda _s, _sf, _t: docs
        rows = T._bigram_logprob(spark, "unused").collect()
    finally:
        T.load_table = orig
    got = {r.lang: (r.n_docs, r.mean_lp, r.worst_lp) for r in rows}
    assert got == expect


def test_train_curriculum_phases(spark):
    """Curriculum phases vs a Python model: quartile thresholds on the
    avg-word-length score, 4 phases covering all docs, monotone score
    envelopes, and exact per-phase counts."""
    from substreams_sink_clickhouse_spark.operators.training import (
        _train_curriculum,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").collect()
    scores = []
    for r in docs:
        ws = r.text.lower().split(" ")
        scores.append((r.n_chars / len(ws), len(ws)))
    import numpy as np

    t = np.percentile([s for s, _ in scores], [25, 50, 75],
                      method="linear")
    phase_of = lambda s: (
        1 if s <= t[0] + 1e-9 else 2 if s <= t[1] + 1e-9
        else 3 if s <= t[2] + 1e-9 else 4
    )
    expect = {}
    for s, nw in scores:
        p = phase_of(s)
        n, tok = expect.get(p, (0, 0))
        expect[p] = (n + 1, tok + nw)

    rows = _train_curriculum(spark, "/root/testdata/sf0.001").collect()
    got = {r.phase: (r.n_docs, r.tok_sum) for r in rows}
    assert got == expect
    assert sum(n for n, _ in got.values()) == len(docs)
    # phases are ordered by difficulty: envelopes must not overlap
    # beyond the threshold nudge
    ordered = sorted(rows, key=lambda r: r.phase)
    for a, b in zip(ordered, ordered[1:]):
        assert a.s_max <= b.s_min + 1e-6
