#!/bin/bash
# Final round-2 validation: the two driver-comparable configs on the final tree.
cd /root/repo
LOG=/root/repo/perf/r2m.jsonl
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" >> $LOG.err
  env "$@" BENCH_REPEATS=3 python bench.py >> $LOG 2>> $LOG.err
}
run
run BENCH_KIND=train BENCH_BATCH=8 BENCH_REMAT=1
echo "R2M QUEUE DONE $(date -u +%H:%M:%S)" >> $LOG
