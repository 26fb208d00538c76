#!/bin/bash
# blk2048 with KERNEL-LOCAL vmem only (no global TPU_SCOPED_VMEM_KIB):
# isolates the attention-block effect from global fusion-budget changes.
cd /root/repo
OUT=perf/r3g_vmem.jsonl
echo "=== blk2048_local ($(date +%H:%M:%S))" >> /tmp/r3g_err.log
if out=$(timeout 2400 env BENCH_REPEATS=5 FLASH_BLOCK_Q=2048 FLASH_BLOCK_K=2048 python bench.py 2>>/tmp/r3g_err.log); then
  echo "${out%\}}, \"variant\": \"blk2048_local\"}" >> "$OUT"
else
  echo "{\"variant\": \"blk2048_local\", \"error\": \"exit $?\"}" >> "$OUT"
fi
echo DONE3 >> /tmp/r3g_err.log
