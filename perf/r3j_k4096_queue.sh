#!/bin/bash
# Follow the winning direction (whole-KV blocks, no online rescale):
# q2048_k4096 = 2.048. Corner points around it.
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
run q1024_k4096 FLASH_BLOCK_Q=1024 FLASH_BLOCK_K=4096
run q4096_k4096 FLASH_BLOCK_Q=4096 FLASH_BLOCK_K=4096 FLASH_VMEM_MB=112
echo DONE6 >> /tmp/r3i_err.log
