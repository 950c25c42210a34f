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
