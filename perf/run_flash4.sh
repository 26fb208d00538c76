#!/bin/bash
# Combined perf candidates after qkv-fusion + packed-1024 defaults.
cd /root/repo
LOG=/root/repo/perf/flash4_r2.jsonl
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" >> $LOG.err
  env "$@" BENCH_REPEATS=2 python bench.py >> $LOG 2>> $LOG.err
}
run BENCH_ATTN=auto                    # packed-1024 + qkv fusion (new default)
run BENCH_ATTN=auto FLASH_IMPL=official  # official kernel for long self-attn
run BENCH_ATTN=reference               # XLA attn + qkv fusion (isolate fusion gain)
echo "FLASH4 DONE $(date -u +%H:%M:%S)" >> $LOG
