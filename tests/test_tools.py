

def test_sample_manifest_stratified_and_deterministic():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "sample_manifest",
        os.path.join(os.path.dirname(__file__), "..", "tools", "sample_manifest.py"),
    )
    sm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sm)

    fams = sm.family_map()
    plan = sm.build_sample(round_no=7, size=50)
    plan2 = sm.build_sample(round_no=7, size=50)
    assert plan["sample"] == plan2["sample"]  # deterministic
    assert len(plan["sample"]) == 50
    assert len(set(plan["sample"])) == 50  # no dupes
    name_to_fam = {n: f for f, ns in fams.items() for n in ns}
    for n in plan["sample"]:
        assert n in name_to_fam
    # since round 7 the sample IS the committed GATE_ORDER prefix —
    # the driver samples a prefix of queries(), whose order is that
    # file, so the manifest must agree with it exactly
    import json

    with open(os.path.join(os.path.dirname(__file__), "..", "GATE_ORDER.json")) as fh:
        committed = json.load(fh)
    all_names = set(name_to_fam)
    assert plan["sample"] == [n for n in committed if n in all_names][:50]
    assert plan["source"] == "GATE_ORDER.json prefix"
    # the rotation's priority block lands inside the sample (after any
    # last-FAIL queue-jumpers) — asserted against the tool's committed
    # PRIORITY list, not a hardcoded round snapshot.  A failed pinned
    # entry may queue-jump ahead of its PRIORITY rank, never behind,
    # so assert containment + never-later relative order.
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import write_gate_order as wgo

    pinned = [n for n in wgo.PRIORITY if n in all_names]
    sample = plan["sample"]
    assert set(pinned) <= set(sample)
    in_sample = [n for n in sample if n in pinned]
    for rank, n in enumerate(pinned):
        assert in_sample.index(n) <= rank


def test_oracle_type_audit_catches_nested_banned_types():
    """The banned-type sweep must catch HUGEINT nested inside
    LIST/STRUCT/MAP, not just top-level columns (round-6 advisory:
    fullmatch let 'HUGEINT[]' escape)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "oracle_type_audit",
        os.path.join(os.path.dirname(__file__), "..", "tools", "oracle_type_audit.py"),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    assert m.is_banned("HUGEINT")
    assert m.is_banned("HUGEINT[]")
    assert m.is_banned("STRUCT(x HUGEINT)")
    assert m.is_banned("MAP(VARCHAR, UHUGEINT)")
    assert m.is_banned("STRUCT(ts TIMESTAMP WITH TIME ZONE)")
    assert not m.is_banned("BIGINT")
    assert not m.is_banned("TIMESTAMP")
    assert not m.is_banned("DECIMAL(38,0)")
