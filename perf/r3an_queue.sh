#!/bin/bash
# Session-8 queue 5: turbo modes at the OTHER BASELINE op points.
#   sweep: the reference's real harness (3 ids x 8 prompts + FIQA + pose)
#     under the champion combo (controls: exact 2.04, quant-only 2.255);
#   latency: true batch-1 sequential under dc3 x civ(5,20) (control
#     0.608 s/img; quant alone was NEGATIVE at batch 1 -- 1.438).
cd /root/repo
OUT=perf/r3an_queue.jsonl
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3an_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3an_err.log
  if out=$(timeout "$to" env "$@" python bench.py 2>>/tmp/r3an_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
run sweep_turbo 5400 BENCH_KIND=sweep BENCH_QUANT=w8a8 BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=5:20 BENCH_REPEATS=5
run lat_turbo 3600 BENCH_KIND=latency BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=5:20 BENCH_REPEATS=5
run lat_turbo_quant 3600 BENCH_KIND=latency BENCH_QUANT=w8a8 BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=5:20 BENCH_REPEATS=5
echo DONE_R3AN >> /tmp/r3an_err.log
