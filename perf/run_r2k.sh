#!/bin/bash
# Round-2 queue K: train batch sweet-spot between 8 (fits) and 16 (needs chunking).
cd /root/repo
while ! grep -q "R2J QUEUE DONE" /root/repo/perf/r2j.jsonl 2>/dev/null; do sleep 60; done
LOG=/root/repo/perf/r2k.jsonl
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" >> $LOG.err
  env "$@" BENCH_REPEATS=2 python bench.py >> $LOG 2>> $LOG.err
}
run BENCH_KIND=train BENCH_BATCH=12 BENCH_REMAT=1
run BENCH_KIND=train BENCH_BATCH=12 BENCH_REMAT=1 BENCH_REMAT_ID=1
echo "R2K QUEUE DONE $(date -u +%H:%M:%S)" >> $LOG
