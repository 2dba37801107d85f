#!/usr/bin/env bash
# CI entry (reference: .github/workflows/python-conda-CI.yml ran
# `main.py -T` smoke runs; we run the full pytest pyramid + the smoke mode).
set -euo pipefail
cd "$(dirname "$0")/.."

python -m pytest tests/ -q
python scripts/main.py --test --cpu
echo "CI OK"
