#!/usr/bin/env bash
# One-command reproduction of everything the external gates check:
#   bash tools/ci.sh [sf_dir]
# 1. schema audit  — no driver-hostile complex output columns
# 2. oracle gate   — every queries() entry vs its DuckDB oracle
# 3. unit tests    — merge kernel, streaming, codecs, plan shapes, ...
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"

echo "== schema audit =="
python tools/audit_schemas.py

echo "== oracle output-type audit (no HUGEINT/TIMESTAMPTZ columns) =="
python tools/oracle_type_audit.py

echo "== oracle gate ($SF_DIR) =="
python tools/check_correctness.py "$SF_DIR"

echo "== plan sweep (cartesian / error screen) =="
python tools/plan_sweep.py | tail -3

echo "== shuffle budgets (sf0.1 headline regression gate) =="
python tools/shuffle_budget.py

echo "== unit tests =="
python -m pytest tests/ -q

echo "CI green."
