#!/bin/bash
# Per-program XLA option search, train + FR programs (the sampler's winner
# FCM was ~neutral on train and -33% on embed — options are program
# specific). Controls: train bs8+remat 8.82-8.85, fr bs128 1678.
cd /root/repo
OUT=perf/r3t_train_options.jsonl
run() {
  tag="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3t_err.log
  if out=$(timeout 2400 env "$@" python bench.py 2>>/tmp/r3t_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
T="BENCH_KIND=train BENCH_BATCH=8 BENCH_REMAT=1"
run train_membound BENCH_KIND=train BENCH_BATCH=8 BENCH_REMAT=1 XLA_COMPILER_OPTIONS='{"xla_tpu_memory_bound_loop_optimizer_options":"enabled:true"}'
run train_nested BENCH_KIND=train BENCH_BATCH=8 BENCH_REMAT=1 XLA_COMPILER_OPTIONS='{"xla_tpu_enable_multi_level_nested_loop_fusion":"true"}'
run train_lhs BENCH_KIND=train BENCH_BATCH=8 BENCH_REMAT=1 XLA_COMPILER_OPTIONS='{"xla_tpu_enable_latency_hiding_scheduler":"true"}'
run fr_nested BENCH_KIND=fr XLA_COMPILER_OPTIONS='{"xla_tpu_enable_multi_level_nested_loop_fusion":"true"}'
run fr_membound BENCH_KIND=fr XLA_COMPILER_OPTIONS='{"xla_tpu_memory_bound_loop_optimizer_options":"enabled:true"}'
echo DONE14 >> /tmp/r3t_err.log
