#!/bin/bash
cd /root/repo
while ! grep -q "BS2 DONE" /root/repo/perf/bs2_r2.jsonl 2>/dev/null; do sleep 30; done
LOG=/root/repo/perf/train2_r2.jsonl
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" >> $LOG.err
  env "$@" BENCH_KIND=train BENCH_REPEATS=2 python bench.py >> $LOG 2>> $LOG.err
}
run BENCH_BATCH=2     # headline: reference attn default (r1 parity check)
run BENCH_BATCH=8     # batch scaling at reference attn
echo "TRAIN2 DONE $(date -u +%H:%M:%S)" >> $LOG
