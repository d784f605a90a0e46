#!/usr/bin/env bash
# Full local gate: unit/behavioral tests -> DuckDB oracle -> bench.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== tests =="
python -m pytest tests/ -q

echo "== oracle gate (sf0.01) =="
python tools/check_oracle.py /root/testdata/sf0.01

echo "== bench (sf0.1) =="
python bench.py
