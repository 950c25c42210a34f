"""End-to-end tour: every layer of the engine in one short run.

    python examples/tour.py [sf_dir]     (default /root/testdata/sf0.001)

1. **Ingest** — synthesize a `DatabaseChanges` JSONL stream (the
   reference's wire payload, pb/.../database.pb.go:75-209) and run the
   full pipeline: decode -> validate -> keyed merge -> versioned
   commit + cursor.
2. **Query** — the sunk table with VERBATIM ClickHouse SQL through the
   dialect shim, plus a TPC-H shape over the analytics fixtures.
3. **LLM data pipeline** — Gopher quality rules -> MinHash near-dup
   pairs -> deterministic train/val/test split -> BM25 retrieval.
4. **Deletion vectors** — an UPDATE epoch committed as a sidecar
   (delta + dv), then incremental OPTIMIZE compacting just the
   fragmented buckets.
5. **Maintenance** — OPTIMIZE (pk clustering), parts introspection,
   cursor state.

Each step prints one JSON line; the driver-facing correctness gate
(tools/check_correctness.py) is the exhaustive version of step 2/3.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(spark, sf_dir: str, workdir: str) -> dict:
    from substreams_sink_clickhouse_spark.catalog import (
        BLOCK_META_SCHEMA,
        Catalog,
        TableInfo,
    )
    from substreams_sink_clickhouse_spark.config import EngineConfig
    from substreams_sink_clickhouse_spark.engine import Engine
    from substreams_sink_clickhouse_spark.operators.dedup import _dedup_minhash
    from substreams_sink_clickhouse_spark.operators.text import _bm25, _gopher_rules
    from substreams_sink_clickhouse_spark.operators.tpch import _tpch_q3
    from substreams_sink_clickhouse_spark.operators.training import _train_split

    out: dict = {}

    # -- 1. ingest ----------------------------------------------------
    stream = os.path.join(workdir, "changes")
    os.makedirs(stream, exist_ok=True)
    msgs = []
    for i in range(1, 51):
        msgs.append(
            json.dumps(
                {
                    "block_num": i,
                    "block_id": f"0x{i:04x}",
                    "table_changes": [
                        {
                            "table": "block_meta",
                            "pk": f"blk{i}",
                            "ordinal": 1,
                            "operation": "CREATE",
                            "fields": [
                                {"name": "number", "new_value": str(i), "old_value": None},
                                {
                                    "name": "timestamp",
                                    "new_value": str(1700000000 + 12 * i),
                                    "old_value": None,
                                },
                            ],
                        }
                    ],
                }
            )
        )
    with open(os.path.join(stream, "blocks.jsonl"), "w") as fh:
        fh.write("\n".join(msgs))
    cat = Catalog()
    cat.register(TableInfo("block_meta", BLOCK_META_SCHEMA, "id"))
    eng = Engine(
        spark,
        EngineConfig(
            warehouse_dir=os.path.join(workdir, "wh"),
            checkpoint_dir=os.path.join(workdir, "ckpt"),
        ),
    )
    pipe = eng.ingest(stream, cat)
    out["ingest"] = {
        "rows": eng.table("block_meta").count(),
        "cursor_block": eng.cursor().block_num if eng.cursor() else None,
    }

    # -- 2. query: ClickHouse SQL unchanged + a TPC-H shape -----------
    row = eng.sql(
        "SELECT uniqExact(id) AS n, toInt64(maxIf(number, number < 40)) AS m "
        "FROM block_meta FORMAT JSONEachRow",
        dialect="clickhouse",
    ).collect()[0]
    out["clickhouse_sql"] = {"n_blocks": row["n"], "max_under_40": row["m"]}
    # FROM t FINAL and parameterized aggregates run unchanged too
    row = eng.sql(
        "SELECT uniqExact(id) AS n, "
        "round(quantileExact(0.5)(number), 1) AS med "
        "FROM block_meta FINAL",
        dialect="clickhouse",
    ).collect()[0]
    out["final_and_param_aggs"] = {"n": row["n"], "median_block": row["med"]}
    # ORDER BY ... WITH FILL: the gap-filled spine materializes through
    # Engine.sql (generated rows carry type defaults — counts fill as 0)
    filled = eng.sql(
        "SELECT toInt64(intDiv(number, 10)) AS decade, count() AS n "
        "FROM block_meta GROUP BY decade "
        "ORDER BY decade WITH FILL FROM 0 TO 8",
        dialect="clickhouse",
    ).collect()
    out["with_fill"] = {
        "rows": len(filled),
        "zero_filled": sum(1 for r in filled if r["n"] == 0),
    }
    out["tpch_q3_rows"] = _tpch_q3(spark, sf_dir).count()
    # partsupp shapes run on a deterministic synthesized partsupp
    from substreams_sink_clickhouse_spark.operators.tpch_partsupp import _tpch_q16

    out["tpch_q16_rows"] = _tpch_q16(spark, sf_dir).count()

    # -- 3. LLM data pipeline -----------------------------------------
    gopher = _gopher_rules(spark, sf_dir)
    g = gopher.selectExpr(
        "avg(gopher_pass) AS pass_rate",
        "avg(n_words) AS avg_words",
        "avg(alpha_frac) AS alpha",
    ).collect()[0]
    # tiny fixtures fail the 50-word floor; the per-rule flags show
    # which rule gates (the point of emitting flags, not one boolean)
    out["gopher"] = {
        "pass_rate": round(g["pass_rate"], 3),
        "avg_words": round(g["avg_words"], 1),
        "avg_alpha_frac": round(g["alpha"], 3),
    }
    out["minhash_dup_pairs"] = _dedup_minhash(spark, sf_dir).count()
    out["train_split"] = {
        r["split"]: r["n_docs"] for r in _train_split(spark, sf_dir).collect()
    }
    out["bm25_top"] = [
        (r["doc_id"], r["bm25"]) for r in _bm25(spark, sf_dir).limit(3).collect()
    ]
    # LTTB: each event_type's series downsampled to 12 visually
    # representative points (round-5 dashboard aggregate)
    from pyspark.sql import functions as _F

    from substreams_sink_clickhouse_spark.operators.window_ext import lttb
    from substreams_sink_clickhouse_spark.sources.tables import (
        load_table as _lt,
    )

    ev = _lt(spark, sf_dir, "events").select(
        _F.col("event_type").alias("g"),
        _F.unix_timestamp("ts").alias("x"),
        _F.col("value").alias("y"),
        "event_id",
    )
    out["lttb_points"] = lttb(ev, ["g"], "x", "y", 12, order=["x", "event_id"]).count()
    # the same operators, fluently, over any documents DataFrame
    from substreams_sink_clickhouse_spark.operators.corpus import Corpus
    from substreams_sink_clickhouse_spark.sources.tables import load_table

    c = Corpus(load_table(spark, sf_dir, "documents"))
    out["corpus_api"] = {
        "n_docs": c.count(),
        "after_exact_dedup": c.dedup_exact().count(),
        "after_minhash_dedup": c.dedup_exact().dedup_minhash().count(),
        # round 6: perceptual-hash dedup + weighted mixing schedule
        "after_phash_dedup": c.dedup_phash().count(),
        "interleave_first_slot": c.interleave(_F.lit(1))
        .filter("interleave_rank = 1")
        .count(),
        # round 10: span-level duplicate REMOVAL (cleaned text re-emitted)
        "words_after_span_scrub": c.scrub_dup_spans()
        .df.selectExpr(
            "sum(CASE WHEN text = '' THEN 0 ELSE size(split(text, ' ')) END) AS w"
        )
        .collect()[0]["w"],
    }

    # round 8: the tokenizer loop end-to-end (train merges over the
    # vocabulary, then encode the corpus with them) + diverse selection
    out["bpe"] = {
        "merges": [
            r["pair"]
            for r in c.bpe_train(n_merges=4, post_top_k=1).collect()
            if r["step"] <= 4
        ],
        "encoded_docs": c.bpe_encode(n_merges=4).count(),
    }
    from substreams_sink_clickhouse_spark.operators.similarity import (
        _sim_kcenter,
        _sim_mmr,
    )

    out["selection"] = {
        "kcenter_picks": [r["vec_id"] for r in _sim_kcenter(spark, sf_dir).collect()],
        "mmr_picks": [r["vec_id"] for r in _sim_mmr(spark, sf_dir).collect()],
    }

    # multimodal: real codec roundtrip (baseline JPEG, stdlib+numpy)
    from substreams_sink_clickhouse_spark.operators.jpeg_codec import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    img = bytes([40] * 64)  # one flat 8x8 block: DC-only, exact
    w, h, back = decode_jpeg_gray(encode_jpeg_gray(img, 8, 8))
    out["jpeg_roundtrip_exact"] = (w, h) == (8, 8) and back == img
    # color: solid 16x16 MCU -> exact through the 4:2:0 pipeline
    import numpy as np

    from substreams_sink_clickhouse_spark.operators.jpeg_codec import (
        decode_jpeg_color,
        encode_jpeg_color,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )

    rgb = np.full((16, 16, 3), (20, 200, 90), dtype=np.uint8)
    _, _, cback = decode_jpeg_color(encode_jpeg_color(rgb.tobytes(), 16, 16))
    out["jpeg_color_exact"] = cback == ycbcr_to_rgb(*rgb_to_ycbcr(rgb)).tobytes()

    # -- 4. deletion vectors (round 5) ---------------------------------
    # an UPDATE epoch commits as a sidecar (delta + dv) instead of
    # rewriting buckets; incremental OPTIMIZE compacts just those
    with open(os.path.join(stream, "update.jsonl"), "w") as fh:
        fh.write(
            json.dumps(
                {
                    "block_num": 51,
                    "block_id": "0x0033",
                    "table_changes": [
                        {
                            "table": "block_meta", "pk": "blk7", "ordinal": 1,
                            "operation": "UPDATE",
                            "fields": [{"name": "number", "new_value": "777",
                                        "old_value": None}],
                        }
                    ],
                }
            )
        )
    pipe.run_to_completion(stream)
    entry = pipe.state.read_manifest()["tables"]["block_meta"]
    out["deletion_vectors"] = {
        "sidecar_buckets": sum(
            1 for v in entry["buckets"].values() if isinstance(v, dict)
        ),
        "updated_number": eng.table("block_meta")
        .filter("id = 'blk7'")
        .collect()[0]["number"],
    }
    out["optimize_fragmented"] = pipe.state.optimize(
        "block_meta", only_fragmented=True
    )

    # -- 5. maintenance ------------------------------------------------
    out["optimize"] = pipe.state.optimize("block_meta")
    out["parts"] = pipe.state.parts("block_meta")[:1]
    # operational SQL runs unchanged: both reference mutation shapes
    # (db/operations.go:93-111) route to bucket-bounded rewrites
    upd = eng.sql(
        "ALTER TABLE block_meta UPDATE number = toInt64(number) WHERE number = '777'",
        dialect="clickhouse",
    ).collect()[0]
    out["maintenance_sql"] = {"alter_update_matched": int(upd.n_updated)}
    return out


def main() -> int:
    from substreams_sink_clickhouse_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("tour")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory(prefix="sscs_tour_") as workdir:
        for step, payload in run(spark, sf_dir, workdir).items():
            print(json.dumps({step: payload}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
