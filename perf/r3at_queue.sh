#!/bin/bash
# Session-9 queue 5 (chains after r3as): the candidate FINAL turbo stack —
# static act scales x int8 VAE decoder x DeepCache-3 x cfg_interval(5,20) —
# plus DPM-20 with the static-quant kernel. Controls: champion dynamic
# 3.888 (r3aq same-day), champion static 4.198 (r3ao), dpm rows (r3ar).
cd /root/repo
OUT=perf/r3at_queue.jsonl
for i in $(seq 1 480); do
  grep -q DONE_R3AS /tmp/r3as_err.log 2>/dev/null && break
  sleep 60
done
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3at_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3at_err.log
  if out=$(timeout "$to" env "$@" python bench.py 2>>/tmp/r3at_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
run turbo_champion_static_vae 5400 BENCH_QUANT=w8a8+vae BENCH_QUANT_ACT=0.05 BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=5:20 BENCH_REPEATS=5
run dpm20_quant_static 3600 BENCH_SCHEDULER=dpm BENCH_STEPS=20 BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_REPEATS=5
run dpm20_quant_static_dc3 3600 BENCH_SCHEDULER=dpm BENCH_STEPS=20 BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_DEEPCACHE=3 BENCH_REPEATS=5
echo DONE_R3AT >> /tmp/r3at_err.log
