#!/bin/bash
# Train-step flash-backward block variants (round 3): bwd blocks default
# 512/512 because larger ones exceeded the 16 MB scoped-VMEM limit; the
# kernel-local vmem_limit_bytes now admits 1024 blocks (FLASH_VMEM_MB
# forces the budget if the 3-tile estimate is too small for the bwd's
# extra temporaries). Reference comparison points: bs8+remat 8.92 img/s,
# bs2 4.58 img/s (STATUS.md round 3).
cd /root/repo
OUT=perf/r3h_train.jsonl

run() {
  tag="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3h_err.log
  if out=$(timeout 2400 env "$@" python bench.py 2>>/tmp/r3h_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}

run train_bs8_control BENCH_KIND=train BENCH_BATCH=8 BENCH_REMAT=1
run train_bs8_bwdblk1024 BENCH_KIND=train BENCH_BATCH=8 BENCH_REMAT=1 FLASH_BWD_BLOCK_Q=1024 FLASH_BWD_BLOCK_K=1024 FLASH_VMEM_MB=64
run train_bs2_control BENCH_KIND=train BENCH_BATCH=2
run train_bs2_bwdblk1024 BENCH_KIND=train BENCH_BATCH=2 FLASH_BWD_BLOCK_Q=1024 FLASH_BWD_BLOCK_K=1024 FLASH_VMEM_MB=64
echo DONE4 >> /tmp/r3h_err.log
