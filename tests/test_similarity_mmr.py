"""MMR re-ranking vs an independent Python model: pool selection,
greedy pick order, and scores must match exactly (same λ, empty-set
max = 0, mmr DESC / vec_id ASC ties)."""

import math

from substreams_sink_clickhouse_spark.operators import similarity as S

SF = "/root/testdata/sf0.001"


def _cos(a, b):
    dot = sum(float(x) * float(y) for x, y in zip(a, b))
    na = math.sqrt(sum(float(x) * float(x) for x in a))
    nb = math.sqrt(sum(float(y) * float(y) for y in b))
    return dot / (na * nb)


def test_sim_mmr_model_comparison(spark):
    from substreams_sink_clickhouse_spark.sources.tables import load_table

    rows = load_table(spark, SF, "embeddings").collect()
    vecs = {r.vec_id: r.embedding for r in rows}
    probe = vecs[S.PROBE_VEC_ID]

    rel = {
        vid: _cos(v, probe)
        for vid, v in vecs.items()
        if vid != S.PROBE_VEC_ID
    }
    pool = sorted(rel, key=lambda k: (-rel[k], k))[: S.MMR_POOL]
    lam = 0.7
    selected, expect = [], []
    for step in range(1, S.MMR_K + 1):
        best = None
        for c in pool:
            if c in selected:
                continue
            msim = max(
                (_cos(vecs[c], vecs[s]) for s in selected), default=None
            )
            mmr = lam * rel[c] if msim is None else lam * rel[c] - (1 - lam) * msim
            if best is None or (-mmr, c) < (-best[1], best[0]):
                best = (c, mmr)
        selected.append(best[0])
        expect.append((step, best[0], round(rel[best[0]], 6), round(best[1], 6)))

    got = [
        (r.step, r.vec_id, r.rel, r.mmr)
        for r in S._sim_mmr(spark, SF).collect()
    ]
    # Python's sum() folds in the same left-to-right order as the
    # engine-side aggregate, so scores match to the last rounded digit
    assert [(s, v) for s, v, *_ in got] == [(s, v) for s, v, *_ in expect]
    for g, e in zip(got, expect):
        assert abs(g[2] - e[2]) < 1e-9 and abs(g[3] - e[3]) < 1e-9
    # diversity is doing something: the greedy set must not simply be
    # the top-k by relevance unless the data makes them identical
    topk = pool[: S.MMR_K]
    if [v for _, v, *_ in expect] != topk:
        assert [v for _, v, *_ in got] != topk


def test_sim_kcenter_model_comparison(spark):
    """Greedy farthest-point traversal vs an independent Python model:
    pick order and min-distances match exactly (squared L2, seed =
    probe vector, mind DESC / vec_id ASC ties)."""
    from substreams_sink_clickhouse_spark.sources.tables import load_table

    rows = load_table(spark, SF, "embeddings").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}

    def sqd(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    selected = [S.PROBE_VEC_ID]
    expect = [(1, S.PROBE_VEC_ID, 0.0)]
    for step in range(2, S.KCENTER_K + 1):
        best = None
        for vid, v in vecs.items():
            if vid in selected:
                continue
            mind = min(sqd(v, vecs[s]) for s in selected)
            if best is None or (-mind, vid) < (-best[1], best[0]):
                best = (vid, mind)
        selected.append(best[0])
        expect.append((step, best[0], round(best[1], 6)))

    got = [(r.step, r.vec_id, r.dist) for r in S._sim_kcenter(spark, SF).collect()]
    assert [(s, v) for s, v, _ in got] == [(s, v) for s, v, _ in expect]
    for g, e in zip(got, expect):
        assert abs(g[2] - e[2]) < 1e-6
    # the traversal spreads out: every later pick is no farther than
    # the previous one (greedy k-center's monotone radius property)
    dists = [d for _, _, d in got[1:]]
    assert all(a >= b for a, b in zip(dists, dists[1:]))


def test_sim_rrf_fusion_model_comparison(spark):
    """RRF fusion vs a Python model: leg ranks from the oracle-exact
    BM25/cosine scorers, score = sum of 1/(60+rank), top-10."""
    from substreams_sink_clickhouse_spark.operators.text import _bm25
    from substreams_sink_clickhouse_spark.sources.tables import load_table

    lex = [(r.doc_id, r.bm25) for r in _bm25(spark, SF).collect()]
    r_lex = {d: i + 1 for i, (d, _) in enumerate(lex)}

    rows = load_table(spark, SF, "embeddings").collect()
    vecs = {r.vec_id: r.embedding for r in rows}
    probe = vecs[S.PROBE_VEC_ID]
    sims = sorted(
        ((vid, _cos(v, probe)) for vid, v in vecs.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[: S.RRF_LEG]
    r_dense = {vid: i + 1 for i, (vid, _) in enumerate(sims)}

    ids = set(r_lex) | set(r_dense)
    scored = sorted(
        (
            (
                -(
                    (1.0 / (S.RRF_K0 + r_lex[i]) if i in r_lex else 0.0)
                    + (1.0 / (S.RRF_K0 + r_dense[i]) if i in r_dense else 0.0)
                ),
                i,
            )
            for i in ids
        )
    )[:10]
    expect = [
        (i, r_lex.get(i), r_dense.get(i), round(-neg, 6)) for neg, i in scored
    ]

    got = [
        (r.id, r.r_lex, r.r_dense, r.rrf)
        for r in S._sim_rrf_fusion(spark, SF).collect()
    ]
    assert got == expect
    # fusion actually fuses: at least one result must be lex-only or
    # dense-only unless the two legs are identical sets
    if set(r_lex) != set(r_dense):
        assert any(r[1] is None or r[2] is None for r in got) or all(
            i in r_lex and i in r_dense for i, *_ in got
        )
