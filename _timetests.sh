#!/bin/bash
for f in tests/test_*.py; do
  s=$(date +%s)
  timeout 570 python -m pytest "$f" -q --no-header -p no:cacheprovider 2>&1 | tail -1 > /tmp/tt_out
  e=$(date +%s)
  echo "$((e-s))s $f :: $(cat /tmp/tt_out)"
done
