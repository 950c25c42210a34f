"""The examples/tour.py walkthrough runs end-to-end on the session
fixture and reports every layer."""

import sys


def test_tour_runs_all_layers(spark, tmp_path):
    sys.path.insert(0, "examples")
    from tour import run

    out = run(spark, "/root/testdata/sf0.001", str(tmp_path))
    assert out["ingest"]["rows"] == 50
    assert out["ingest"]["cursor_block"] == 50
    assert out["clickhouse_sql"] == {"n_blocks": 50, "max_under_40": 39}
    assert out["tpch_q3_rows"] > 0
    assert set(out["train_split"]) == {"train", "val", "test"}
    assert len(out["bm25_top"]) == 3
    assert out["optimize"]["files_after"] >= 1
    assert out["parts"][0]["rows"] > 0
    assert len(out["bpe"]["merges"]) == 4
    assert out["bpe"]["encoded_docs"] > 0
    assert len(out["selection"]["kcenter_picks"]) == 5
    assert len(out["selection"]["mmr_picks"]) == 5
