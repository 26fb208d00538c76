#!/bin/bash
# Session-7 queue 4 (runs after r3ah): rolling (continuous-batching) serving
# vs the classic batch engine, burst and staggered arrivals.
#   burst (all N at once): classic should win or tie on pure throughput
#     (rolling pays per-tick dispatch + per-image decode granularity);
#   staggered (one submit per 400 ms): rolling should crush p50/p95 request
#     latency (admission is immediate; classic waits for batch boundaries).
cd /root/repo
OUT=perf/r3ai_queue.jsonl
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3ai_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3ai_err.log
  if out=$(timeout "$to" env "$@" python bench.py 2>>/tmp/r3ai_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
run serve_burst_rolling 5400 BENCH_KIND=serve BENCH_ROLLING=1 BENCH_REPEATS=5
run serve_stagger_rolling 5400 BENCH_KIND=serve BENCH_ROLLING=1 BENCH_SERVE_STAGGER_MS=400 BENCH_REPEATS=3
run serve_stagger_classic 5400 BENCH_KIND=serve BENCH_SERVE_STAGGER_MS=400 BENCH_REPEATS=3
run serve_burst_classic 3600 BENCH_KIND=serve BENCH_REPEATS=5
echo DONE_R3AI >> /tmp/r3ai_err.log
