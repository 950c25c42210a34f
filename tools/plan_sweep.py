"""Plan sweep: physical-plan health metrics for EVERY gate entry.

Prints one line per query — exchange count, cartesian/BNLJ flags,
whole-stage codegen spans — and a summary of outliers.  The per-entry
plan *narratives* live in PLANS.md; this is the fleet-wide screen that
catches a bad plan hiding among 200 good ones.

Usage: python tools/plan_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as E
    from substreams_sink_clickhouse_spark.plans.explain import (
        codegen_spans,
        count_shuffles,
        simple_plan,
    )
    from substreams_sink_clickhouse_spark.session import get_spark

    spark = get_spark("plan-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, fn in sorted(E.queries().items()):
        try:
            df = fn(spark, sf_dir)
            plan = simple_plan(df)
            rows.append(
                {
                    "q": name,
                    "exchanges": count_shuffles(df),
                    "cartesian": "CartesianProduct" in plan,
                    "bnlj": "BroadcastNestedLoopJoin" in plan,
                    "codegen": codegen_spans(df),
                }
            )
        except Exception as exc:  # noqa: BLE001 - sweep must finish
            rows.append({"q": name, "error": str(exc)[:120]})
    for r in rows:
        print(r)
    bad = [r for r in rows if r.get("cartesian")]
    heavy = [r for r in rows if r.get("exchanges", 0) >= 6]
    errs = [r for r in rows if "error" in r]
    print(f"\n== {len(rows)} plans; cartesian={len(bad)} "
          f"exchanges>=6={len(heavy)} errors={len(errs)}")
    for r in bad + heavy + errs:
        print("  OUTLIER:", r)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
