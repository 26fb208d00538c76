#!/bin/bash
# Round-2 queue C: bs16 unlock via identity-branch remat, re-attribution,
# block_q sweep at the new mxu_sum default. Waits for queue B to finish.
cd /root/repo
while ! grep -q "R2B QUEUE DONE" /root/repo/perf/r2b.jsonl 2>/dev/null; do sleep 60; done
LOG=/root/repo/perf/r2c.jsonl
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" >> $LOG.err
  env "$@" BENCH_REPEATS=2 python bench.py >> $LOG 2>> $LOG.err
}
run BENCH_KIND=train BENCH_BATCH=16 BENCH_REMAT=1 BENCH_REMAT_ID=1
run BENCH_KIND=train BENCH_BATCH=8 BENCH_REMAT=1 BENCH_REMAT_ID=1
run BENCH_ABLATE=no_attn
run FLASH_BLOCK_Q=2048 FLASH_BLOCK_K=1024
echo "R2C QUEUE DONE $(date -u +%H:%M:%S)" >> $LOG
