#!/bin/bash
# Sampler XLA-flag + flash-block sweep at the bs8 default (round 3).
# XLA_FLAGS are read at backend init, so each variant is a fresh process;
# runs strictly sequentially (single chip). Appends tagged JSON lines.
cd /root/repo
OUT=perf/r3c_flags.jsonl

run() {
  tag="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3c_err.log
  if out=$(timeout 2400 env "$@" python bench.py 2>>/tmp/r3c_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}

run control BENCH_REPEATS=3
run vmem32m XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=32768
run vmem64m XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536
run vmem112m XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=114688
run lhs XLA_FLAGS=--xla_tpu_enable_latency_hiding_scheduler=true
run flashq2048 FLASH_BLOCK_Q=2048 FLASH_BLOCK_K=2048
echo DONE >> /tmp/r3c_err.log
