#!/bin/bash
# Session-9 queue 3 (chains after r3aq): DPM-Solver++ few-step mode.
# The reference itself trusts DPM-Solver++ for validation sampling
# (train_ID-Booth.py:147); as an opt-in turbo row it trades 30 DDPM steps
# for 15-20 deterministic 2nd-order steps. Same-day anchors: exact DDPM-30
# 2.087, quant 2.334 (r3ao), champion 3.891-band (r3aq re-measure).
cd /root/repo
OUT=perf/r3ar_queue.jsonl
for i in $(seq 1 420); do
  grep -q DONE_R3AQ /tmp/r3aq_err.log 2>/dev/null && break
  sleep 60
done
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3ar_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3ar_err.log
  if out=$(timeout "$to" env "$@" python bench.py 2>>/tmp/r3ar_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
run dpm20_exact 3600 BENCH_SCHEDULER=dpm BENCH_STEPS=20 BENCH_REPEATS=5
run dpm20_quant 3600 BENCH_SCHEDULER=dpm BENCH_STEPS=20 BENCH_QUANT=w8a8 BENCH_REPEATS=5
run dpm20_quant_dc3 3600 BENCH_SCHEDULER=dpm BENCH_STEPS=20 BENCH_QUANT=w8a8 BENCH_DEEPCACHE=3 BENCH_REPEATS=5
run dpm15_exact 3600 BENCH_SCHEDULER=dpm BENCH_STEPS=15 BENCH_REPEATS=5
run lat_dpm20 3600 BENCH_KIND=latency BENCH_SCHEDULER=dpm BENCH_STEPS=20 BENCH_REPEATS=5
echo DONE_R3AR >> /tmp/r3ar_err.log
