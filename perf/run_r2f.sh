#!/bin/bash
# Round-2 queue F: streaming GN slab kernel, bs16 unlock with identity chunking.
cd /root/repo
while ! grep -q "R2E QUEUE DONE" /root/repo/perf/r2e.jsonl 2>/dev/null; do sleep 60; done
LOG=/root/repo/perf/r2f.jsonl
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" >> $LOG.err
  env "$@" BENCH_REPEATS=2 python bench.py >> $LOG 2>> $LOG.err
}
run GN_IMPL=pallas
run BENCH_KIND=train BENCH_BATCH=16 BENCH_REMAT=1 BENCH_REMAT_ID=1 BENCH_ID_CHUNK=4
echo "R2F QUEUE DONE $(date -u +%H:%M:%S)" >> $LOG
