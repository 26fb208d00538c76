#!/bin/bash
# Resume the round-4 per-file timing run (the session-2 run went
# alphabetically and the machine restart killed it after
# test_full_chain_parity; its /tmp logs are gone but its slow entries
# live in tests/slow_tests.json). Runs the REMAINING files, one pytest
# process per file (crash isolation), logs INSIDE the repo so progress
# survives restarts. nice -n 19 so the concurrent TPU bench chain keeps
# CPU priority on the 1-core host (pytest call times may read a touch
# high, which only ever rounds tier assignment toward "slow" — safe).
cd /root/repo
LOGS=perf/durations_r4
mkdir -p "$LOGS"
for f in tests/test_*.py; do
  name=$(basename "$f" .py)
  [[ "$name" > "test_full_chain_parity" ]] || continue
  [[ -s "$LOGS/$name.log" ]] && continue
  nice -n 19 timeout 2400 python -m pytest "$f" -q --durations=0 \
    > "$LOGS/$name.log" 2>&1
  echo "$name exit=$? ($(date +%H:%M:%S))" >> "$LOGS/progress.txt"
done
echo DONE_DURATIONS_R4 >> "$LOGS/progress.txt"
