#!/bin/bash
# Run the test suite one pytest process per test file.
#
# Why: very long single-process runs have (rarely) segfaulted inside
# XLA:CPU's JIT after hundreds of accumulated compilations — an
# environment-level flake, not a test failure (the same test passes in
# isolation). Per-file processes bound the blast radius, identify the
# crashing file exactly, and let a rerun resume from the failures only.
#
# Usage: scripts/run_suite_sharded.sh [outdir]   (default /tmp/suite_shards)
set -u
OUT="${1:-/tmp/suite_shards}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
fail=0
for f in tests/test_*.py; do
  name=$(basename "$f" .py)
  if timeout 3600 python -m pytest "$f" -q > "$OUT/$name.log" 2>&1; then
    echo "PASS $name $(grep -Eo '[0-9]+ passed[^ ]*' "$OUT/$name.log" | tail -1)"
  else
    rc=$?
    echo "FAIL $name rc=$rc (log: $OUT/$name.log)"
    fail=1
  fi
done
exit $fail
