#!/bin/bash
# End-to-end sampler measurement of the 4 most promising proto-backed XLA
# options found by the existence probe (perf/r3o_option_probe.jsonl).
# Today's control: 2.043 (perf/r3l_final.jsonl).
cd /root/repo
OUT=perf/r3p_options.jsonl
run() {
  tag="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3p_err.log
  if out=$(timeout 2400 env BENCH_REPEATS=5 "$@" python bench.py 2>>/tmp/r3p_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
run lhs XLA_COMPILER_OPTIONS='{"xla_tpu_enable_latency_hiding_scheduler":"true"}'
run nested_fusion XLA_COMPILER_OPTIONS='{"xla_tpu_enable_multi_level_nested_loop_fusion":"true"}'
run fusion_cost_model XLA_COMPILER_OPTIONS='{"xla_tpu_enable_experimental_fusion_cost_model":"true"}'
run membound_loop XLA_COMPILER_OPTIONS='{"xla_tpu_memory_bound_loop_optimizer_options":"enabled:true"}'
echo DONE10 >> /tmp/r3p_err.log
