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

    ks1, ks2 = list(entry_mod.queries()), list(entry_mod.queries())
    assert ks1 == ks2
    with open("/root/repo/GATE_ORDER.json", encoding="utf-8") as fh:
        committed = json.load(fh)
    present = [n for n in committed if n in set(ks1)]
    assert ks1[: len(present)] == present
    # round-7 prefix: the six entries last driver-sampled as FAIL
    # (r5's HUGEINT class), so CORRECTNESS_r07 confirms the fix
    assert set(ks1[:6]) == {
        "q05b_approx_distinct",
        "q78_json_extract",
        "q111_interval_length_sum",
        "q87_sessionize",
        "dedup_exact",
        "train_mix",
    }
