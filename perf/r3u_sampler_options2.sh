#!/bin/bash
# Sampler option sweep part 2: the remaining reachable proto-backed TPU
# options (perf/r3o_option_probe.jsonl) applied ON TOP of the baked sampler
# default (experimental fusion cost model — core/compile.py merges env over
# tpu_default_options). Control = the current default bench (FCM only).
# Part-1 results (perf/r3p_options.jsonl): fcm +2% (adopted), lhs/nested/
# membound neutral.
cd /root/repo
OUT=perf/r3u_sampler_options2.jsonl
run() {
  tag="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3u_err.log
  if out=$(timeout 2400 env BENCH_REPEATS=5 "$@" python bench.py 2>>/tmp/r3u_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
run control
run dot_dot XLA_COMPILER_OPTIONS='{"xla_tpu_dot_dot_fusion":"true"}'
run dot_dot_dup XLA_COMPILER_OPTIONS='{"xla_tpu_dot_dot_fusion_duplicated":"true"}'
run rwb_off XLA_COMPILER_OPTIONS='{"xla_tpu_rwb_fusion":"false"}'
run dsr_off XLA_COMPILER_OPTIONS='{"xla_tpu_enable_dot_strength_reduction":"false"}'
run v2v_dma XLA_COMPILER_OPTIONS='{"xla_tpu_enable_vmem_to_vmem_dmas":"true"}'
run bcast_prio XLA_COMPILER_OPTIONS='{"xla_tpu_enable_aggressive_broadcast_priority_update":"true"}'
run licm_2 XLA_COMPILER_OPTIONS='{"xla_tpu_licm_size_inflation_ratio":"2.0"}'
echo DONE_R3U >> /tmp/r3u_err.log
