"""Guard the driver contract in __spark_entry__.py: entry() runs the
flagship query at sf0.001 and returns a non-empty DataFrame with a
stable schema; queries()/oracle_sql() stay consistent."""

import __spark_entry__ as entry_mod


def test_entry_flagship(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["r_name", "rev"]


def test_oracles_subset_of_queries():
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(queries)
    # since round 6 EVERY entry has an oracle (q05b's sketch is now
    # checked via an exact count + validated error-bound boolean)
    assert set(queries) == set(oracles)


def test_queries_order_is_committed_and_deterministic():
    """The public queries() order comes from the COMMITTED
    GATE_ORDER.json (round-5 advisory: it must never depend on which
    evaluation artifacts sit on disk).  Two calls agree, the order
    follows the file (stale names ignored, new registry entries
    appended in registry order), and the entries whose most recent
    driver signal is a FAIL lead the prefix (round-6 verdict item 1:
    the driver gate must re-confirm builder-verified fixes first)."""
    import json
    import os

    repo = os.path.join(os.path.dirname(__file__), "..")
    ks1, ks2 = list(entry_mod.queries()), list(entry_mod.queries())
    assert ks1 == ks2
    with open(os.path.join(repo, "GATE_ORDER.json"), encoding="utf-8") as fh:
        committed = json.load(fh)
    present = [n for n in committed if n in set(ks1)]
    assert ks1[: len(present)] == present
    # prefix policy, asserted against the tool's own committed inputs
    # rather than a hardcoded round snapshot.  The tool's exact order
    # is failed + (PRIORITY - failed) + rest, and "failed" is computed
    # from CORRECTNESS artifacts this test should not re-derive — so
    # assert the two policy properties that hold in EVERY round:
    # every pinned entry lands in the driver-visible head (failed set
    # is bounded well below the sample size), and un-failed pinned
    # entries keep PRIORITY's relative order (a failed one may
    # queue-jump ahead, never fall behind).
    import sys

    sys.path.insert(0, os.path.join(repo, "tools"))
    import write_gate_order as wgo

    pinned = [n for n in wgo.PRIORITY if n in set(ks1)]
    pos = {n: i for i, n in enumerate(ks1)}
    assert all(pos[n] < 64 for n in pinned)
    tail_sorted = [n for n in ks1 if n in pinned]
    # each pinned entry appears no LATER than its PRIORITY rank allows
    for rank, n in enumerate(pinned):
        assert tail_sorted.index(n) <= rank
