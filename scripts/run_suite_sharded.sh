#!/bin/bash
# CONVENIENCE runner: the test suite one pytest process per test file.
#
# The plain single-process `python -m pytest tests/ -q` is the canonical
# run and is green (231 tests, round 4) — the XLA:CPU JIT-accumulation
# segfault this script was built around is mitigated by the
# module-boundary `jax.clear_caches()` fixture in tests/conftest.py.
# Keep this only for isolating a crashing file if the flake ever
# resurfaces, or for resuming from failures on slow boxes.
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
