#!/bin/bash
# Round-2 queue H: embed batch scaling continues (5843 @ bs1024 still rising).
cd /root/repo
LOG=/root/repo/perf/r2h.jsonl
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" >> $LOG.err
  env "$@" BENCH_REPEATS=3 python bench.py >> $LOG 2>> $LOG.err
}
run BENCH_KIND=embed BENCH_BATCH=2048
run BENCH_KIND=embed BENCH_BATCH=4096
echo "R2H QUEUE DONE $(date -u +%H:%M:%S)" >> $LOG
