"""Time the DuckDB-oracle side of bench.py's headline set.

BASELINE.md grades the engine against "DuckDB on the same queries at
the same scale"; this makes that half of the comparison reproducible:

    python tools/bench_oracle.py [sf_dir]    # default /root/testdata/sf0.1

Prints one JSON line shaped like bench.py's, so the two are directly
comparable query-by-query.  Queries without an oracle (or whose gate
entry is streaming-only) are skipped and listed in "skipped".
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, oracle_timings  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    timings, skipped = oracle_timings(sf_dir, HEADLINE)

    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_headline_total_wall_clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "skipped": skipped,
                "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
