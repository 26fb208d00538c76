#!/bin/bash
cd /root/repo
LOG=/root/repo/perf/flash2_r2.jsonl
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" >> $LOG.err
  env "$@" BENCH_ATTN=flash BENCH_REPEATS=2 python bench.py >> $LOG 2>> $LOG.err
}
run FLASH_BLOCK_Q=512 FLASH_BLOCK_K=1024
run FLASH_BLOCK_Q=512 FLASH_BLOCK_K=2048
run FLASH_BLOCK_Q=1024 FLASH_BLOCK_K=1024
echo "FLASH2 DONE $(date -u +%H:%M:%S)" >> $LOG
