#!/bin/bash
# Session-10 queue 3 (chains after r3aw): DPM few-step at the SWEEP op point
# (BASELINE config 5 — the full generate+PNG+FIQA+pose harness). The sweep
# bench now threads BENCH_SCHEDULER/BENCH_STEPS; the hypothesis is the
# harness tracks the raw sampler (as it did for every other turbo row:
# champion sweep ran at 97% of the raw turbo sampler, perf/r3an). Anchors:
# sweep exact 2.04, sweep quant-dyn 2.255; raw dpm20 3.065 / dpm20-quant
# 3.410 (r3ar); sweep_quant_static queued in r3av.
cd /root/repo
for i in $(seq 1 600); do
  grep -q DONE_R3AW /tmp/r3aw_err.log 2>/dev/null && break
  sleep 60
done
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3ax_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3ax_err.log
  if out=$(timeout "$to" env "$@" python bench.py 2>>/tmp/r3ax_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> perf/r3ax_queue.jsonl
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> perf/r3ax_queue.jsonl
  fi
}
run sweep_dpm20_exact 5400 BENCH_KIND=sweep BENCH_SCHEDULER=dpm BENCH_STEPS=20 BENCH_REPEATS=5
run sweep_dpm20_quant_static_dc3 5400 BENCH_KIND=sweep BENCH_SCHEDULER=dpm BENCH_STEPS=20 BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_DEEPCACHE=3 BENCH_REPEATS=5
echo DONE_R3AX >> /tmp/r3ax_err.log
