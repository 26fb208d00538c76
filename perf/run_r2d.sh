#!/bin/bash
# Round-2 queue D: re-run bs16 unlock (prev attempt hit worker recovery),
# fixed-eligibility GN kernel. Waits for queue C.
cd /root/repo
while ! grep -q "R2C QUEUE DONE" /root/repo/perf/r2c.jsonl 2>/dev/null; do sleep 60; done
sleep 120   # let the worker settle between queues
LOG=/root/repo/perf/r2d.jsonl
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" >> $LOG.err
  env "$@" BENCH_REPEATS=2 python bench.py >> $LOG 2>> $LOG.err
}
run BENCH_KIND=train BENCH_BATCH=16 BENCH_REMAT=1 BENCH_REMAT_ID=1
run GN_IMPL=pallas
echo "R2D QUEUE DONE $(date -u +%H:%M:%S)" >> $LOG
