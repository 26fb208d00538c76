#!/bin/bash
# Clean re-measure of the scoped-VMEM sampler variants: the first r3g rows
# overlapped a CPU-pegged pytest on the 1-CPU host (times 4.16-4.22 s vs
# the 3.99 s control) — re-run control + variants back-to-back on a quiet
# host for a decision-grade comparison.
cd /root/repo
OUT=perf/r3g_vmem.jsonl

run() {
  tag="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3g_err.log
  if out=$(timeout 2400 env "$@" python bench.py 2>>/tmp/r3g_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}

run control_quiet BENCH_REPEATS=5
run svmem64_quiet BENCH_REPEATS=5 TPU_SCOPED_VMEM_KIB=65536
run svmem64_blk2048_quiet BENCH_REPEATS=5 TPU_SCOPED_VMEM_KIB=65536 FLASH_BLOCK_Q=2048 FLASH_BLOCK_K=2048
echo DONE2 >> /tmp/r3g_err.log
