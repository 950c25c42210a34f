

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
    plan = sm.build_sample(round_no=4, size=50)
    plan2 = sm.build_sample(round_no=4, size=50)
    assert plan["sample"] == plan2["sample"]  # deterministic
    assert len(plan["sample"]) == 50
    assert len(set(plan["sample"])) == 50  # no dupes
    picked_fams = set()
    name_to_fam = {n: f for f, ns in fams.items() for n in ns}
    for n in plan["sample"]:
        assert n in name_to_fam
        picked_fams.add(name_to_fam[n])
    # every family represented
    assert picked_fams == set(fams)
    # a different round rotates at least some picks
    plan5 = sm.build_sample(round_no=5, size=50)
    assert plan5["sample"] != plan["sample"]
