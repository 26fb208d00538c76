#!/bin/bash
cd /root/repo
while ! grep -q "TRAIN ABLATION DONE" /root/repo/perf/train_r2.jsonl 2>/dev/null; do sleep 30; done
LOG=/root/repo/perf/flags_r2.jsonl
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" >> $LOG.err
  env "$@" BENCH_REPEATS=2 python bench.py >> $LOG 2>> $LOG.err
}
run XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=98304
run BENCH_BATCH=16 FLASH_BF16_EXP=1   # bf16-exp at the new 1024/1024 blocks
echo "FLAGS DONE $(date -u +%H:%M:%S)" >> $LOG
