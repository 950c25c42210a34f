"""Stratified correctness-sample rotation plan for the driver.

The driver checks ~50 of the gate's queries per round against the
DuckDB oracle (CORRECTNESS_r{N}.json).  Left to itself the sample has
stuck to the relational/TPC-H families three rounds running, so the
streaming, ClickHouse-compat, and LLM-pipeline families (166+ entries)
have never produced a hard driver-side signal.

This tool emits a deterministic, stratified, per-round rotation plan:

* every family (= operator module in ``registry.all_specs`` order) is
  represented each round, allocation proportional to family size with
  a floor of 1;
* within a family, entries that have NEVER appeared in any
  ``CORRECTNESS_r*.json`` on disk are drawn first; the remainder
  rotates by round number, so over ceil(216/50) ≈ 5 rounds every gate
  entry gets driver-checked;
* output is machine-readable JSON (``--json PATH``) plus a readable
  table, so the driver — or anyone reproducing the gate — can run
  exactly::

      python tools/check_correctness.py /root/testdata/sf0.01 $(python
      tools/sample_manifest.py --round 4 --names-only)

Usage:
    python tools/sample_manifest.py [--round N] [--size 50]
                                    [--json SAMPLE_MANIFEST.json]
                                    [--names-only]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def family_map() -> dict[str, list[str]]:
    """Family -> spec names, in registry order (family = module)."""
    from substreams_sink_clickhouse_spark.registry import all_specs

    fams: dict[str, list[str]] = {}
    for spec in all_specs():
        mod = type(spec).__module__  # fallback
        # the builder's defining module is the family
        builder = spec.builder
        mod = getattr(builder, "__module__", mod)
        fam = mod.rsplit(".", 1)[-1]
        fams.setdefault(fam, []).append(spec.name)
    return fams


def sampled_history() -> dict[str, int]:
    """name -> number of driver rounds it has appeared in."""
    counts: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        try:
            with open(path) as fh:
                rec = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        for name in rec:
            counts[name] = counts.get(name, 0) + 1
    return counts


def last_fail_set() -> set[str]:
    """Names whose MOST RECENT driver signal is a FAIL.

    These jump the queue (round-6 verdict item 1): a fix verified only
    by the builder/judge is `weak` until the driver gate that flagged
    it confirms it green.
    """
    last_round: dict[str, int] = {}
    failed: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(
            "".join(c for c in os.path.basename(path) if c.isdigit()) or 0
        )
        try:
            with open(path) as fh:
                rec = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in rec.items():
            if rnd < last_round.get(name, 0):
                continue
            last_round[name] = rnd
            ok = (
                not row.get("err")
                and row.get("rows_match", False)
                and row.get("schema_match", False)
                and row.get("hash_match", False)
            )
            (failed.discard if ok else failed.add)(name)
    return failed


def infer_round() -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1


def build_sample(round_no: int, size: int) -> dict:
    fams = family_map()
    history = sampled_history()
    total = sum(len(v) for v in fams.values())
    size = min(size, total)

    # The driver samples a prefix of ``queries()``, whose order IS the
    # committed GATE_ORDER.json (written by tools/write_gate_order.py).
    # When that file exists, the manifest's sample is exactly that
    # prefix — the two artifacts must agree or the manifest misleads.
    gate_path = os.path.join(REPO, "GATE_ORDER.json")
    if os.path.exists(gate_path):
        with open(gate_path) as fh:
            order = json.load(fh)
        all_names = {n for ns in fams.values() for n in ns}
        sample = [n for n in order if n in all_names][:size]
        fam_of = {n: f for f, ns in fams.items() for n in ns}
        alloc: dict[str, int] = {f: 0 for f in fams}
        for n in sample:
            alloc[fam_of[n]] += 1
        return {
            "round": round_no,
            "size": len(sample),
            "total_entries": total,
            "never_driver_sampled": sum(
                1
                for ns in fams.values()
                for n in ns
                if history.get(n, 0) == 0
            ),
            "source": "GATE_ORDER.json prefix",
            "families": {f: len(ns) for f, ns in fams.items()},
            "allocation": alloc,
            "sample": sample,
            "command": (
                "python tools/check_correctness.py /root/testdata/sf0.01 "
                + " ".join(sample)
            ),
        }

    # proportional allocation with a floor of 1 per family
    alloc: dict[str, int] = {}
    for fam, names in fams.items():
        alloc[fam] = max(1, round(size * len(names) / total))
    # trim/pad to exactly `size`, preferring to trim the largest allocs
    # and pad the families with the most never-sampled entries
    def never_count(fam: str) -> int:
        return sum(1 for n in fams[fam] if history.get(n, 0) == 0)

    while sum(alloc.values()) > size:
        fam = max(alloc, key=lambda f: (alloc[f], -never_count(f)))
        if alloc[fam] <= 1:
            break
        alloc[fam] -= 1
    while sum(alloc.values()) < size:
        fam = max(
            fams,
            key=lambda f: (never_count(f) - alloc[f], len(fams[f]) - alloc[f]),
        )
        if alloc[fam] >= len(fams[fam]):
            break
        alloc[fam] += 1

    failed = last_fail_set()
    sample: list[str] = []
    for fam, names in fams.items():
        k = min(alloc[fam], len(names))
        # previously-FAILED first (the driver must re-confirm the fix),
        # then never-sampled (stable registry order), then the rest
        # rotated by round so repeats spread across rounds
        fail = [n for n in names if n in failed]
        never = [n for n in names if history.get(n, 0) == 0 and n not in failed]
        seen = [
            n for n in names if history.get(n, 0) > 0 and n not in failed
        ]
        rot = (round_no * k) % len(seen) if seen else 0
        ordered = fail + never + seen[rot:] + seen[:rot]
        sample.extend(ordered[:k])

    return {
        "round": round_no,
        "size": len(sample),
        "total_entries": total,
        "never_driver_sampled": sum(
            1 for ns in fams.values() for n in ns if history.get(n, 0) == 0
        ),
        "families": {f: len(ns) for f, ns in fams.items()},
        "allocation": alloc,
        "sample": sample,
        "command": (
            "python tools/check_correctness.py /root/testdata/sf0.01 "
            + " ".join(sample)
        ),
    }


def main() -> int:
    args = sys.argv[1:]
    round_no = None
    size = 50
    json_out = None
    names_only = False
    i = 0
    while i < len(args):
        if args[i] == "--round":
            round_no = int(args[i + 1]); i += 2
        elif args[i] == "--size":
            size = int(args[i + 1]); i += 2
        elif args[i] == "--json":
            json_out = args[i + 1]; i += 2
        elif args[i] == "--names-only":
            names_only = True; i += 1
        else:
            raise SystemExit(f"unknown arg {args[i]}")
    if round_no is None:
        round_no = infer_round()
    plan = build_sample(round_no, size)
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(plan, fh, indent=1)
    if names_only:
        print(" ".join(plan["sample"]))
        return 0
    print(
        f"round {plan['round']}: {plan['size']}/{plan['total_entries']} entries, "
        f"{plan['never_driver_sampled']} never driver-sampled remain"
    )
    for fam, n in plan["allocation"].items():
        picked = [s for s in plan["sample"] if s in set(family_map()[fam])]
        print(f"  {fam:28s} {n:3d}/{plan['families'][fam]:3d}  {' '.join(picked[:6])}"
              + (" ..." if len(picked) > 6 else ""))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
