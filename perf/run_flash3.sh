#!/bin/bash
cd /root/repo
LOG=/root/repo/perf/flash3_r2.jsonl
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" >> $LOG.err
  env "$@" BENCH_ATTN=flash BENCH_REPEATS=2 python bench.py >> $LOG 2>> $LOG.err
}
run FLASH_IMPL=official
run FLASH_BF16_EXP=1
run FLASH_IMPL=official FLASH_BF16_EXP=1
echo "FLASH3 DONE $(date -u +%H:%M:%S)" >> $LOG
