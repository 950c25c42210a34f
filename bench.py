"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the summed wall-clock of the headline queries (excluding
session startup; including plan build + execution + collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: Representative headline set: scan/filter/agg/join/window/subquery/
#: streaming-analytics/CDC-merge/dedup/similarity/text.
HEADLINE = [
    "q03_filter",
    "q04_agg",
    "q05_count_distinct",
    "q07_star_join",
    "q08_outer_join",
    "q12_window_rank",
    "q14_topk",
    "q16_correlated",
    "q18_dates",
    "q22_json",
    "q23_tumbling_window",
    "q24_session_window",
    "q26_last_op",
    "cdc_merge",
    "dedup_exact",
    "dedup_minhash",
    "sim_topk",
    "text_fingerprint",
    "multimodal_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from substreams_sink_clickhouse_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    # Warm-up: run the headline set once at the smallest SF.  This
    # compiles every plan's codegen, loads parquet/FS classes, and
    # starts the Arrow Python workers — one-time engine costs that a
    # long-running cluster amortizes away and a throughput benchmark
    # should not attribute to individual queries.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in HEADLINE:
            try:
                queries[name](spark, warm_dir).count()
            except Exception:
                pass

    # Best-of-3 per query: the first execution of a plan at a new scale
    # still pays one-time JIT/codegen compilation inside the JVM, and
    # single runs see ±30% scheduler/GC noise; the minimum reflects the
    # engine's steady-state throughput, which is what a long-running
    # cluster delivers.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
