#!/bin/bash
# Round-2 continuation queue B: MXU-sum headline, GN slab kernel, train default.
cd /root/repo
LOG=/root/repo/perf/r2b.jsonl
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" >> $LOG.err
  env "$@" BENCH_REPEATS=2 python bench.py >> $LOG 2>> $LOG.err
}
run FLASH_TAG=mxu_sum_default_blocks             # default 1024/1024 + FLASH_MXU_SUM=1
run FLASH_MXU_SUM=0 FLASH_TAG=mxu_sum_off        # control
run GN_IMPL=pallas FLASH_TAG=gn_pallas           # fused GN slab kernel
run BENCH_KIND=train BENCH_BATCH=8 BENCH_REMAT=1 # new train default (auto -> flash bwd)
echo "R2B QUEUE DONE $(date -u +%H:%M:%S)" >> $LOG
