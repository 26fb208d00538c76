#!/bin/bash
# xla_tpu_enable_experimental_fusion_cost_model measured +2% on the sampler
# (2.084 vs 2.043, perf/r3p_options.jsonl). Validate across the other
# BASELINE configs before baking it in as a default.
# Controls: train bs8+remat 8.82-8.85, bs2 4.52-4.54, embed 6358, fr 1678.
cd /root/repo
OUT=perf/r3r_fcm.jsonl
FCM='{"xla_tpu_enable_experimental_fusion_cost_model":"true"}'
run() {
  tag="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3r_err.log
  if out=$(timeout 2400 env "$@" python bench.py 2>>/tmp/r3r_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
run train_bs8_fcm BENCH_KIND=train BENCH_BATCH=8 BENCH_REMAT=1 XLA_COMPILER_OPTIONS="$FCM"
run train_bs2_fcm BENCH_KIND=train BENCH_BATCH=2 XLA_COMPILER_OPTIONS="$FCM"
run embed_fcm BENCH_KIND=embed XLA_COMPILER_OPTIONS="$FCM"
run fr_fcm BENCH_KIND=fr XLA_COMPILER_OPTIONS="$FCM"
echo DONE12 >> /tmp/r3r_err.log
