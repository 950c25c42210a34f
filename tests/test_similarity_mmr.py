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
