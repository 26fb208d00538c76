#!/bin/bash
# Session-3 TPU queue, part B (after perf/r3u_sampler_options2.sh):
#  - sampler denoise-loop unroll=2 (scan-unrolled; cross-step scheduling)
#  - retries of the two r3t variants that hit the 2400 s timeout
#    (compile of the latency-hiding scheduler variants is slow)
cd /root/repo
OUT=perf/r3v_queue.jsonl
run() {
  tag="$1"; to="$2"; shift 2
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3v_err.log
  if out=$(timeout "$to" env "$@" python bench.py 2>>/tmp/r3v_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
run unroll2 3600 BENCH_REPEATS=5 BENCH_UNROLL=2
run train_lhs 3600 BENCH_KIND=train BENCH_BATCH=8 BENCH_REMAT=1 XLA_COMPILER_OPTIONS='{"xla_tpu_enable_latency_hiding_scheduler":"true"}'
run fr_nested 3600 BENCH_KIND=fr XLA_COMPILER_OPTIONS='{"xla_tpu_enable_multi_level_nested_loop_fusion":"true"}'
echo DONE_R3V >> /tmp/r3v_err.log
