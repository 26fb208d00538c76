#!/bin/bash
# Re-run the sampler time attribution at the new default kernel
# (flash 2048/4096 + kernel-local vmem): updates the bs8 bucket table and
# the attention-at-floor bound in STATUS.md (old: no_attn 2.73 s of 3.99).
cd /root/repo
OUT=perf/r3n_ablate.jsonl
run() {
  tag="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3n_err.log
  if out=$(timeout 2400 env BENCH_REPEATS=5 "$@" python bench.py 2>>/tmp/r3n_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
run no_attn BENCH_ABLATE=no_attn
run no_xf BENCH_ABLATE=no_xf
echo DONE9 >> /tmp/r3n_err.log
