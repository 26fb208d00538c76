#!/bin/bash
# Round-2 continuation: Pallas flash backward + forward block-shape variants.
# Sequential on the one real TPU chip; each line is a full bench run
# (on-TPU profiling is unavailable — see .claude/skills/verify/SKILL.md).
cd /root/repo
LOG=/root/repo/perf/flash_bwd_r2.jsonl
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" >> $LOG.err
  env "$@" BENCH_REPEATS=2 python bench.py >> $LOG 2>> $LOG.err
}
# train: Pallas backward (FLASH_BWD=auto default) at the measured best config
run BENCH_KIND=train BENCH_BATCH=8 BENCH_REMAT=1 BENCH_ATTN=flash
# does the fused backward unlock bs16 (OOM with XLA saved-residuals)?
run BENCH_KIND=train BENCH_BATCH=16 BENCH_REMAT=1 BENCH_ATTN=flash
# reference operating point bs2(+prior)
run BENCH_KIND=train BENCH_BATCH=2 BENCH_ATTN=flash
# sampler forward: single-KV-pass shapes (no online-softmax state updates)
run FLASH_BLOCK_Q=256 FLASH_BLOCK_K=4096
run FLASH_BLOCK_Q=512 FLASH_BLOCK_K=2048
echo "FLASH BWD QUEUE DONE $(date -u +%H:%M:%S)" >> $LOG
