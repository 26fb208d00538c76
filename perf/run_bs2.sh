#!/bin/bash
cd /root/repo
while ! grep -q "FLAGS DONE" /root/repo/perf/flags_r2.jsonl 2>/dev/null; do sleep 30; done
LOG=/root/repo/perf/bs2_r2.jsonl
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" >> $LOG.err
  env "$@" BENCH_REPEATS=2 python bench.py >> $LOG 2>> $LOG.err
}
run BENCH_BATCH=24
run BENCH_BATCH=32 BENCH_DECODE_CHUNK=16
echo "BS2 DONE $(date -u +%H:%M:%S)" >> $LOG
