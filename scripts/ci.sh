#!/usr/bin/env bash
# Full local gate: unit/behavioral tests -> DuckDB oracle -> bench.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== tests =="
python -m pytest tests/ -q

echo "== oracle gate (sf0.01) =="
python tools/check_oracle.py /root/testdata/sf0.01

echo "== rotating oracle batch (sf0.1) =="
# 12 names per run in registry order, cursor in .oracle_rotation —
# catches scale-dependent nondeterminism the sf0.01 gate can't see
python tools/rotate_oracle.py /root/testdata/sf0.1 12

echo "== bench (sf0.1) =="
python bench.py
