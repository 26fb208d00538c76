#!/bin/bash
# Train-step roofline attribution (VERDICT r1 #9).
cd /root/repo
LOG=/root/repo/perf/train_r2.jsonl
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" >> $LOG.err
  env "$@" BENCH_KIND=train BENCH_REPEATS=2 python bench.py >> $LOG 2>> $LOG.err
}
run BENCH_BATCH=2                       # baseline triplet bs2 (ref op point)
run BENCH_BATCH=2 BENCH_LOSS=           # drop identity branch
run BENCH_BATCH=8                       # batch scaling
run BENCH_BATCH=8 BENCH_REMAT=1         # remat at bigger batch
run BENCH_BATCH=16 BENCH_REMAT=1        # push batch w/ remat
echo "TRAIN ABLATION DONE $(date -u +%H:%M:%S)" >> $LOG
