#!/bin/bash
# Flash block-shape sweep at bs8 with kernel-local vmem (follow-up to
# blk2048_local = 2.021): bigger q blocks cut K/V HBM refetch per KV sweep;
# block_k = 4096 (whole KV) removes online-softmax rescaling entirely.
cd /root/repo
OUT=perf/r3i_blocks.jsonl

run() {
  tag="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3i_err.log
  if out=$(timeout 2400 env BENCH_REPEATS=5 "$@" python bench.py 2>>/tmp/r3i_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}

run q4096_k1024 FLASH_BLOCK_Q=4096 FLASH_BLOCK_K=1024
run q2048_k4096 FLASH_BLOCK_Q=2048 FLASH_BLOCK_K=4096
run q4096_k2048 FLASH_BLOCK_Q=4096 FLASH_BLOCK_K=2048
echo DONE5 >> /tmp/r3i_err.log
