"""Property test for the BPE family: on random small corpora, the
Spark trainer/encoder must agree with an independent Python BPE model
(merge order, per-doc token counts) and with itself (encode totals ==
weighted final-vocabulary size)."""

import collections

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORD = st.text(alphabet="ab1", min_size=1, max_size=5)
_DOC = st.lists(_WORD, min_size=1, max_size=8).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=6)


def _model(corpus, n_merges):
    """Reference BPE: '_' end marker, '+' pair identity, left-to-right
    non-overlapping apply, (cnt DESC, pair ASC) ties."""
    # keep exactly the operator's filter: ^[a-z0-9]+$
    import re

    words = collections.Counter(
        w for t in corpus for w in t.split() if re.fullmatch(r"[a-z0-9]+", w)
    )
    vocab = {w: tuple(w) + ("_",) for w in words}
    merges = []
    for _ in range(n_merges):
        pc = collections.Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[syms[i] + "+" + syms[i + 1]] += words[w]
        if not pc:
            break
        mx = max(pc.values())
        bp = min(p for p, n in pc.items() if n == mx)
        merges.append((bp, mx))
        left, right = bp.split("+")
        for w, syms in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = out[-1] + s
                else:
                    out.append(s)
            vocab[w] = tuple(out)
    return words, vocab, merges


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus=_CORPUS, n_merges=st.integers(min_value=1, max_value=3))
def test_bpe_encode_matches_model_and_train(spark, corpus, n_merges):
    from substreams_sink_clickhouse_spark.operators.text import (
        bpe_encode,
        bpe_train,
    )

    words, vocab, merges = _model(corpus, n_merges)
    if not words:
        return  # nothing survives the [a-z0-9]+ filter; operators emit 0 rows
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"]
    )

    got = {
        r.doc_id: (r.n_words, r.n_tokens, r.n_syms0)
        for r in bpe_encode(docs, n_merges=n_merges).collect()
    }
    expect = {}
    for i, t in enumerate(corpus):
        import re

        ws = [w for w in t.split() if re.fullmatch(r"[a-z0-9]+", w)]
        if ws:
            expect[i] = (
                len(ws),
                sum(len(vocab[w]) for w in ws),
                sum(len(w) + 1 for w in ws),
            )
    assert got == expect

    # trainer agreement: learned merge sequence matches the model
    rows = bpe_train(docs, n_merges=n_merges, post_top_k=3).collect()
    got_merges = [(r.pair, r.cnt) for r in rows if r.step <= n_merges]
    assert got_merges == merges

    # internal consistency: corpus-wide token total from the encoder
    # equals the frequency-weighted final vocabulary size
    total_tokens = sum(v[1] for v in got.values())
    assert total_tokens == sum(len(s) * words[w] for w, s in vocab.items())
