#!/bin/bash
# Full-sampler scoped-VMEM / flash-block variants via the new
# core.compile per-compile option forwarding (perf/r3f_vmem_probe.jsonl
# proved the mechanism; today's control: 2.004 img/s, perf/r3c_flags.jsonl).
# Fresh process per variant: TPU_SCOPED_VMEM_KIB is read at sampler import.
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

run svmem64 TPU_SCOPED_VMEM_KIB=65536
run svmem64_blk2048 TPU_SCOPED_VMEM_KIB=65536 FLASH_BLOCK_Q=2048 FLASH_BLOCK_K=2048
run svmem112_blk2048 TPU_SCOPED_VMEM_KIB=114688 FLASH_BLOCK_Q=2048 FLASH_BLOCK_K=2048
echo DONE >> /tmp/r3g_err.log
