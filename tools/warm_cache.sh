#!/bin/bash
# Populate the persistent JAX compile cache by running each test file in
# its own pytest process.  Long single-process runs segfault in the cache
# writer (XLA:CPU compiler heap corruption on this box); young processes
# never do.  After warming, `pytest tests/ -x -q` is nearly all cache
# reads and completes reliably.
cd "$(dirname "$0")/.."
for f in tests/test_*.py; do
  echo "=== $f ==="
  timeout 5400 python -m pytest "$f" -q 2>&1 | tail -2
done
