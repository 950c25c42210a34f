"""Generate GATE_ORDER.json — the committed, deterministic order in
which ``__spark_entry__.queries()`` exposes the gate registry.

Rationale: the external driver samples a prefix of ``queries()`` for
its per-round correctness check.  Rotating that prefix is how
verification debt drains (162/258 entries had never produced a
driver-side signal by round 5) — but the rotation must NOT be computed
at ``queries()`` import time from whatever CORRECTNESS_r*.json happen
to sit on disk: that makes the public interface order nondeterministic
across checkouts (round-5 advisory).  So the rotation is decided HERE,
explicitly, and committed as a plain JSON list; ``queries()`` just
reads the file.  Re-running this tool (and committing the result) is
the explicit, reviewable act of advancing the rotation.

Ordering policy:
1. entries whose MOST RECENT driver signal is a FAIL (any of
   rows/schema/hash mismatch or error in the highest-numbered
   CORRECTNESS_r*.json containing them).  Their fixes are only
   builder/judge-verified until the driver itself re-samples them, so
   they take the very front of the prefix (round-6 verdict, item 1);
2. a hand-pinned priority prefix of never-sampled entries worth
   checking early (new round additions, the dialect anchor);
3. all other never-driver-sampled entries, round-robin across operator
   families so every family appears in any ~50-entry prefix;
4. previously-sampled entries, least-recently-sampled first.

Usage: python tools/write_gate_order.py [--out GATE_ORDER.json]
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: Entries ordered to the front of the next sample (after the
#: last-FAIL entries, which are computed from the CORRECTNESS
#: artifacts, not pinned here).  Refreshed each round: the round-10
#: pins (additions + the round-5 tail) were ALL driver-sampled in
#: r10, draining the never-sampled ledger to zero.  Round 11 pins
#: only the entries whose VALUES or plan shape changed this round —
#: the five additions (FULL ANY / ASOF USING translations, DoReMi,
#: RHO-LOSS, longest-span dedup) plus the reworked dedup_semantic
#: (corpus-derived clusters), the three-epoch shared DV fixture
#: consumers whose result values changed (cdc_merge_dv, q182), and
#: q187 (ASOF tie-pin changed its window ORDER BY).  Everything else
#: rotates by staleness (round-10 verdict #4): least-recently-
#: driver-sampled first, so every entry's signal stays fresh.
PRIORITY = [
    "dedup_semantic",  # reworked: corpus-derived cluster count
    "cdc_merge_dv",    # three-epoch fixture: values changed
    "q182_scd2_from_versions",  # shared fixture: values changed
    "q187_dialect_asof_join",   # tie-pin joined the window ORDER BY
    "q189_dialect_full_any_join",  # round-11 additions
    "q190_dialect_asof_using",
    "train_doremi",
    "train_rho_loss",
    "dedup_span_longest",
]


def _entry_failed(rec: dict) -> bool:
    """A CORRECTNESS row counts as FAIL if any check is false or errored."""
    if rec.get("err"):
        return True
    return not (
        rec.get("rows_match", False)
        and rec.get("schema_match", False)
        and rec.get("hash_match", False)
    )


def main() -> int:
    out = "GATE_ORDER.json"
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]

    from substreams_sink_clickhouse_spark.registry import all_specs

    # last round each name was sampled in (0 = never) + its last verdict
    last_round: dict[str, int] = {}
    last_fail: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()) or 0)
        with open(path, encoding="utf-8") as fh:
            for name, rec in json.load(fh).items():
                if rnd >= last_round.get(name, 0):
                    last_round[name] = rnd
                    last_fail[name] = _entry_failed(rec)

    specs = all_specs()
    fam_of = {
        s.name: getattr(s.builder, "__module__", "?").rsplit(".", 1)[-1]
        for s in specs
    }
    names = [s.name for s in specs]
    failed = [n for n in names if last_fail.get(n, False)]
    pinned = [n for n in PRIORITY if n in names and n not in failed]
    fresh = [
        n for n in names if n not in last_round and n not in pinned
    ]
    stale = sorted(
        (
            n
            for n in names
            if n in last_round and n not in pinned and n not in failed
        ),
        key=lambda n: (last_round[n], names.index(n)),
    )

    # round-robin the fresh entries across families
    fams: dict[str, list[str]] = {}
    for n in fresh:
        fams.setdefault(fam_of[n], []).append(n)
    rr: list[str] = []
    while any(fams.values()):
        for fam in list(fams):
            if fams[fam]:
                rr.append(fams[fam].pop(0))

    order = failed + pinned + rr + stale
    assert sorted(order) == sorted(names), "order must be a permutation"
    with open(os.path.join(REPO, out), "w", encoding="utf-8") as fh:
        json.dump(order, fh, indent=0)
        fh.write("\n")
    print(
        f"wrote {out}: {len(order)} entries "
        f"({len(failed)} last-FAIL, {len(pinned)} pinned, "
        f"{len(rr)} never-sampled, {len(stale)} sampled)"
    )
    print("prefix:", ", ".join(order[:12]), "...")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
