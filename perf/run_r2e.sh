#!/bin/bash
# Round-2 queue E: split-KV interleave variants. Waits for queue D.
cd /root/repo
while ! grep -q "R2D QUEUE DONE" /root/repo/perf/r2d.jsonl 2>/dev/null; do sleep 60; done
LOG=/root/repo/perf/r2e.jsonl
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" >> $LOG.err
  env "$@" BENCH_REPEATS=2 python bench.py >> $LOG 2>> $LOG.err
}
run FLASH_SPLIT_KV=2
run FLASH_SPLIT_KV=4
run FLASH_SPLIT_KV=2 FLASH_BLOCK_K=2048
echo "R2E QUEUE DONE $(date -u +%H:%M:%S)" >> $LOG
