"""Brute-force property tests for KS and Mann-Whitney U: the
value-grouped distributed formulations must agree with direct Python
computations over arbitrary samples (independent of the DuckDB oracle,
which shares the SQL formulation)."""

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from substreams_sink_clickhouse_spark.operators.clickhouse_compat_ext3 import (
    ks_test,
    mannwhitney_u,
)

#: small integer-valued samples force heavy ties — the hard case
_S = st.lists(st.integers(0, 6), min_size=2, max_size=15)


def _ks_py(a, b):
    vals = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    d = 0.0
    for v in vals:
        fa = sum(1 for x in a if x <= v) / na
        fb = sum(1 for x in b if x <= v) / nb
        d = max(d, abs(fa - fb))
    return round(d, 6)


def _u_py(a, b):
    allv = sorted(a + b)
    # average ranks with ties
    ranks = {}
    i = 0
    while i < len(allv):
        j = i
        while j < len(allv) and allv[j] == allv[i]:
            j += 1
        ranks[allv[i]] = (i + 1 + j) / 2  # mean of ranks i+1..j
        i = j
    r1 = sum(ranks[x] for x in a)
    return round(r1 - len(a) * (len(a) + 1) / 2, 2)


@given(a=_S, b=_S)
@settings(max_examples=10, deadline=None)
def test_ks_and_u_match_bruteforce(spark, a, b):
    rows = [(float(x), True) for x in a] + [(float(x), False) for x in b]
    df = spark.createDataFrame(rows, "v double, is_a boolean")
    got_d = ks_test(df).collect()[0]["ks_d"]
    assert got_d == pytest.approx(_ks_py(a, b), abs=1e-6)
    got_u = mannwhitney_u(df).collect()[0]["u1"]
    assert got_u == pytest.approx(_u_py(a, b), abs=1e-2)


_HOURS = st.lists(
    st.tuples(st.integers(0, 23), st.floats(-5, 5, allow_nan=False)),
    min_size=1,
    max_size=10,
    unique_by=lambda t: t[0],
)


def _interp_py(obs):
    """Python model: hour spine between min and max observed hour,
    linear interpolation between neighbors, edges clamp."""
    obs = dict(obs)
    hours = sorted(obs)
    out = {}
    for h in range(hours[0], hours[-1] + 1):
        if h in obs:
            out[h] = obs[h]
            continue
        prevs = [x for x in hours if x < h]
        nexts = [x for x in hours if x > h]
        p, n = prevs[-1], nexts[0]
        v = obs[p] + (obs[n] - obs[p]) * (h - p) / (n - p)
        out[h] = v
    import math

    return {h: math.floor(v * 10000 + 0.5) / 10000 for h, v in out.items()}


@given(obs=_HOURS)
@settings(max_examples=8, deadline=None)
def test_interpolate_matches_bruteforce(spark, obs):
    from datetime import datetime

    from substreams_sink_clickhouse_spark.operators.clickhouse_compat_ext3 import (
        interpolate_hourly,
    )

    rows = [
        (7, datetime(2024, 1, 1, h), float(v)) for h, v in obs
    ]
    hourly = spark.createDataFrame(rows, "user_id long, h timestamp, v double")
    got = {
        r["h"].hour: r["val"] for r in interpolate_hourly(hourly).collect()
    }
    want = _interp_py(obs)
    assert set(got) == set(want)
    for h in want:
        assert got[h] == pytest.approx(want[h], abs=1e-9), (h, got[h], want[h])


_DOC = st.lists(st.sampled_from(list("abcde")), min_size=1, max_size=55)


def _span_py(docs):
    """Python model of the per-doc duplicated-span fraction."""
    W = 20
    spans = {}
    per_doc = {}
    for did, words in docs.items():
        if len(words) >= W:
            ds = [
                " ".join(words[i * W : (i + 1) * W])
                for i in range(len(words) // W)
            ]
        else:
            ds = [" ".join(words)]
        per_doc[did] = ds
        for sp in ds:
            spans[sp] = spans.get(sp, 0) + 1
    out = {}
    for did, ds in per_doc.items():
        dup = sum(1 for sp in ds if spans[sp] > 1)
        out[did] = (len(ds), dup, round(dup / len(ds), 4))
    return out


@given(ws=st.lists(_DOC, min_size=1, max_size=6))
@settings(max_examples=8, deadline=None)
def test_span_flags_match_bruteforce(spark, ws):
    from substreams_sink_clickhouse_spark.operators.dedup import span_flags

    docs = {i: w for i, w in enumerate(ws)}
    df = spark.createDataFrame(
        [(i, " ".join(w)) for i, w in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["dup_spans"], r["dup_span_frac"])
        for r in span_flags(df).collect()
    }
    assert got == _span_py(docs)


def _theils_py(pairs):
    import math
    from collections import Counter

    n = len(pairs)
    cx = Counter(x for x, _ in pairs)
    cy = Counter(y for _, y in pairs)
    cxy = Counter(pairs)
    hx = -sum((c / n) * math.log(c / n) for c in cx.values())
    hxy = -sum(
        (cy[y] / n) * (c / cy[y]) * math.log(c / cy[y])
        for (x, y), c in cxy.items()
    )
    return round((hx - hxy) / hx, 6)


@given(
    pairs=st.lists(
        st.tuples(st.sampled_from("pq"), st.integers(0, 2)),
        min_size=4,
        max_size=30,
    ).filter(lambda ps: len({x for x, _ in ps}) >= 2)
)
@settings(max_examples=8, deadline=None)
def test_theils_u_matches_bruteforce(spark, pairs):
    from substreams_sink_clickhouse_spark.operators.clickhouse_compat_ext3 import (
        theils_u,
    )

    df = spark.createDataFrame(pairs, "x string, y long")
    got = theils_u(df).collect()[0]["theils_u"]
    assert got == pytest.approx(_theils_py(pairs), abs=1e-6)


def _iv_py(pairs):
    import math
    from collections import defaultdict

    good = defaultdict(int)
    bad = defaultdict(int)
    for c, l in pairs:
        (good if l else bad)[c] += 1
    gt, bt = sum(good.values()), sum(bad.values())
    out = {}
    for c in set(good) | set(bad):
        woe = math.log((good[c] / gt) / (bad[c] / bt))
        out[c] = (
            round(woe, 6),
            round(((good[c] / gt) - (bad[c] / bt)) * woe, 6),
        )
    return out


@given(
    pairs=st.lists(
        st.tuples(st.sampled_from("uvw"), st.integers(0, 1)),
        min_size=6,
        max_size=40,
    ).filter(
        lambda ps: all(
            any(l == v for c2, l in ps if c2 == c) for c in {c for c, _ in ps}
            for v in (0, 1)
        )
        and any(l == 1 for _, l in ps)
        and any(l == 0 for _, l in ps)
    )
)
@settings(max_examples=8, deadline=None)
def test_cat_iv_matches_bruteforce(spark, pairs):
    from substreams_sink_clickhouse_spark.operators.clickhouse_compat_ext3 import (
        cat_iv,
    )

    df = spark.createDataFrame(pairs, "cat string, label int")
    got = {r["cat"]: (r["woe"], r["iv_term"]) for r in cat_iv(df).collect()}
    want = _iv_py(pairs)
    for c in want:
        assert got[c][0] == pytest.approx(want[c][0], abs=1e-6)
        assert got[c][1] == pytest.approx(want[c][1], abs=1e-6)


def _ngram_py(rows):
    from collections import Counter, defaultdict

    total = Counter(g for _, g in rows)
    by_src = defaultdict(list)
    for s_, g in rows:
        by_src[s_].append(g)
    out = {}
    for s_, gs in by_src.items():
        n = len(gs)
        dup = sum(1 for g in gs if total[g] > 1)
        out[s_] = (n, len(set(gs)), round(dup / n, 4))
    return out


@given(
    rows=st.lists(
        st.tuples(st.sampled_from("st"), st.sampled_from(["g1", "g2", "g3", "g4"])),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=8, deadline=None)
def test_ngram_stats_match_bruteforce(spark, rows):
    from substreams_sink_clickhouse_spark.operators.dedup import ngram_stats

    df = spark.createDataFrame(rows, "source string, g string")
    got = {
        r["source"]: (r["total_grams"], r["distinct_grams"], r["dup_frac"])
        for r in ngram_stats(df).collect()
    }
    assert got == _ngram_py(rows)


_TXT = st.text(alphabet="ab #.\n-*", min_size=1, max_size=120).filter(
    lambda t: t.strip()
)


def _gopher_py(text):
    words = text.lower().split(" ")
    n = len(words)
    mean_wlen = sum(len(w) for w in words) / n
    sym = text.count("#") + text.count("...")
    alpha = sum(1 for w in words if any(c.isalpha() for c in w)) / n
    lines = text.split("\n")
    nl = len(lines)
    bullet = sum(
        1 for l in lines if l.strip().startswith(("-", "*", "•"))
    ) / nl
    ellipsis = sum(1 for l in lines if l.strip().endswith("...")) / nl
    stops = {"the", "be", "to", "of", "and", "that", "have", "with"}
    stop_present = len(stops & set(words))
    ok = (
        50 <= n <= 100000
        and 3 <= mean_wlen <= 10
        and sym / n <= 0.1
        and bullet <= 0.9
        and ellipsis <= 0.3
        and alpha >= 0.8
        and stop_present >= 2
    )
    return (
        n,
        round(mean_wlen, 4),
        round(sym / n, 4),
        round(alpha, 4),
        round(bullet, 4),
        round(ellipsis, 4),
        stop_present,
        int(ok),
    )


@given(texts=st.lists(_TXT, min_size=1, max_size=5))
@settings(max_examples=8, deadline=None)
def test_gopher_flags_match_bruteforce(spark, texts):
    from substreams_sink_clickhouse_spark.operators.text import gopher_flags

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_words"], r["mean_wlen"], r["symbol_ratio"], r["alpha_frac"],
            r["bullet_frac"], r["ellipsis_frac"], r["stop_present"],
            r["gopher_pass"],
        )
        for r in gopher_flags(df).collect()
    }
    want = {i: _gopher_py(t) for i, t in enumerate(texts)}
    assert set(got) == set(want)
    for i in want:
        g, w = got[i], want[i]
        # ints exact; rounded floats within one rounding ulp (python
        # round() is banker's, Spark round() is HALF_UP — a .xxxx5
        # half can legitimately differ in the last decimal)
        assert (g[0], g[6], g[7]) == (w[0], w[6], w[7]), (i, g, w)
        for k in (1, 2, 3, 4, 5):
            assert g[k] == pytest.approx(w[k], abs=1.01e-4), (i, k, g, w)
