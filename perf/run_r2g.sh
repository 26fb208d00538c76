#!/bin/bash
# Round-2 queue G: embed timing fix + batch sweep, sweep config re-measure.
cd /root/repo
LOG=/root/repo/perf/r2g.jsonl
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" >> $LOG.err
  env "$@" BENCH_REPEATS=3 python bench.py >> $LOG 2>> $LOG.err
}
run BENCH_KIND=embed BENCH_BATCH=256
run BENCH_KIND=embed BENCH_BATCH=512
run BENCH_KIND=embed BENCH_BATCH=1024
run BENCH_KIND=sweep
echo "R2G QUEUE DONE $(date -u +%H:%M:%S)" >> $LOG
