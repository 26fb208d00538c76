#!/bin/bash
# Round-5 per-file timing run — FULL coverage (VERDICT r4 #1). The r4 run
# finished but its per-file logs were lost between rounds (only
# progress.txt was committed), leaving tests/slow_tests.json at 136/354
# tests measured. This reruns EVERY test file from scratch, one pytest
# process per file (crash isolation), logs IN the repo so the data
# survives restarts, idempotent (skips files with a non-empty log —
# rerunning resumes). nice -n 19 keeps the concurrent TPU bench chain at
# CPU priority on the 1-core host; call times read a touch high, which
# only rounds tier assignment toward "slow" — safe.
#
# Afterwards:
#   python perf/gen_slow_tier.py --logs perf/durations_r5 --threshold 10
# (no --base: this run covers every file, including ones added in r5).
cd /root/repo
LOGS=perf/durations_r5
mkdir -p "$LOGS"
# Priority order: files alphabetically AFTER test_full_chain_parity.py
# first — that is exactly the range whose r4 logs were lost (the merged
# slow_tests.json covers the early range), so fresh coverage lands there
# before re-measuring files the base already times. Idempotent resume
# (non-empty log => skip) is unaffected by the ordering.
FILES=$( { ls tests/test_*.py | awk '$0 > "tests/test_full_chain_parity.py"'; \
           ls tests/test_*.py | awk '$0 <= "tests/test_full_chain_parity.py"'; } )
for f in $FILES; do
  name=$(basename "$f" .py)
  [[ -s "$LOGS/$name.log" ]] && continue
  nice -n 19 timeout 3000 python -m pytest "$f" -q --durations=0 \
    > "$LOGS/$name.log" 2>&1
  echo "$name exit=$? ($(date +%H:%M:%S))" >> "$LOGS/progress.txt"
done
echo DONE_DURATIONS_R5 >> "$LOGS/progress.txt"
