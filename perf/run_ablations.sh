#!/bin/bash
# Sequential sampler time-attribution ablations on the real TPU chip.
# Each is a variant of the known-good bench program (see bench.apply_ablation).
cd /root/repo
LOG=/root/repo/perf/ablations_r2.jsonl
for ab in no_attn no_xf no_gn no_vae; do
  echo "=== BENCH_ABLATE=$ab $(date -u +%H:%M:%S) ===" >> $LOG.err
  BENCH_ABLATE=$ab BENCH_REPEATS=2 python bench.py >> $LOG 2>> $LOG.err
done
echo "ABLATION QUEUE DONE $(date -u +%H:%M:%S)" >> $LOG
