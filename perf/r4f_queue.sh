#!/bin/bash
# Round-4 queue 6: the batch-1 DPM few-step latency frontier. The shipped
# `latency` preset is DDPM-30 x DeepCache-3 x cfg_interval(5,20) bf16
# (0.364 s/img, perf/r3as_queue.jsonl; w8a8 measured NEGATIVE at batch 1
# and stays out). A DPM-20 variant with the proportional guidance
# interval (the turbo cross winner, perf/r4a_queue.jsonl) has never been
# measured at batch 1 — expected ~0.25 s/img. Quality row for the
# candidate spec lands next to the perf row (same gate rule as r4e).
cd /root/repo
OUT=perf/r4f_queue.jsonl
ERR=/tmp/r4f_err.log
for i in $(seq 1 480); do
  grep -q DONE_R4E /tmp/r4e_err.log 2>/dev/null && break
  sleep 60
done
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> "$ERR"
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> "$ERR"
  if out=$(timeout "$to" env "$@" python bench.py 2>>"$ERR"); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
# same-day control: the shipped latency preset
run latency_preset_control 5400 BENCH_KIND=latency BENCH_PRESET=latency BENCH_REPEATS=5
# candidate: DPM-20 x DeepCache-3 x proportional guidance interval, bf16
run latency_dpm20_dc3_civ 5400 BENCH_KIND=latency BENCH_SCHEDULER=dpm BENCH_STEPS=20 BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=3:13 BENCH_REPEATS=5
# quality row for the candidate spec (512x512, vs 30-step ddpm exact)
wait_tpu
echo "=== r4f quality: dpm20 latency candidate ($(date +%H:%M:%S))" >> "$ERR"
timeout 10800 python perf/accel_report_onchip.py \
  --mode 'scheduler=dpm:20+deepcache=3+cfg_interval=3:13' \
  --out perf/r4f_quality.jsonl 2>>"$ERR" \
  || echo "{\"variant\": \"r4f_quality\", \"error\": \"exit $?\"}" >> perf/r4f_quality.jsonl
echo DONE_R4F >> "$ERR"
