#!/bin/bash
# Round-2 queue I: GN single-read re-measure (phase-1 refetch fixed).
cd /root/repo
LOG=/root/repo/perf/r2i.jsonl
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" >> $LOG.err
  env "$@" BENCH_REPEATS=2 python bench.py >> $LOG 2>> $LOG.err
}
run GN_IMPL=pallas
echo "R2I QUEUE DONE $(date -u +%H:%M:%S)" >> $LOG
