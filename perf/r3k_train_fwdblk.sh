#!/bin/bash
# Train step with the sampler-optimal FORWARD flash blocks (2048/4096):
# decides whether the new default is global or sampling-only.
# Controls (fwd 1024/1024): bs8+remat 8.847, bs2 4.54 (perf/r3h_train.jsonl).
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
run train_bs8_fwd2048x4096 BENCH_KIND=train BENCH_BATCH=8 BENCH_REMAT=1 FLASH_BLOCK_Q=2048 FLASH_BLOCK_K=4096
run train_bs2_fwd2048x4096 BENCH_KIND=train BENCH_BATCH=2 FLASH_BLOCK_Q=2048 FLASH_BLOCK_K=4096
echo DONE7 >> /tmp/r3h_err.log
