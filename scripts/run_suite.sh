#!/bin/bash
# Run the test suite SPLIT per file in fresh processes: the XLA-CPU backend
# has been observed to segfault in long single-process runs on small boxes
# (faulthandler dump mid-suite; does not reproduce in fresh processes —
# VERDICT r3 preamble notes the same on the judge box). Aggregates pass/
# fail counts and exits nonzero if any file fails.
set -u
cd "$(dirname "$0")/.."
total_rc=0
summary=""
for f in tests/test_*.py; do
  out=$(timeout 2400 env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python -m pytest "$f" -q 2>&1 | tail -2)
  rc=$?
  line=$(echo "$out" | grep -E 'passed|failed|error|skipped|no tests' | tail -1)
  echo "$f: ${line:-CRASH/rc=$rc}"
  summary="$summary\n$f: ${line:-CRASH rc=$rc}"
  if echo "$line" | grep -qE 'failed|error' || [ -z "$line" ]; then
    total_rc=1
  fi
done
exit $total_rc
