#!/bin/bash
# Round-4 queue 4: open turbo-frontier probes. Round-3 established bs8 as
# the bf16 op point because CFG doubling makes the UNet batch 16 and bs8's
# live set fits HBM better (perf/r3_gnconv_bs.jsonl) — but turbo's w8a8
# int8 body halves weight/activation bytes, so the bs16 question is OPEN
# again under the preset. Also: DeepCache interval 2/4 around the shipped
# dc3, and the DPM-15 step-count frontier (quality-risk rows are
# informational — the preset only changes behind an accel-report gate).
# Controls: turbo preset (bs8) 6.254 img/s (perf/r4a_queue.jsonl).
cd /root/repo
OUT=perf/r4d_queue.jsonl
ERR=/tmp/r4d_err.log
for i in $(seq 1 480); do
  grep -q DONE_R4C /tmp/r4c_err.log 2>/dev/null && break
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
# int8 reopens the batch-size question (preset env is setdefault: explicit wins)
run turbo_bs16 5400 BENCH_PRESET=turbo BENCH_BATCH=16 BENCH_REPEATS=5
# DeepCache interval neighbours around the shipped dc3
run turbo_dc2 5400 BENCH_PRESET=turbo BENCH_DEEPCACHE=2 BENCH_REPEATS=5
run turbo_dc4 5400 BENCH_PRESET=turbo BENCH_DEEPCACHE=4 BENCH_REPEATS=5
# step-count frontier: DPM-15 with a proportional guidance interval
run dpm15_dc3_civ_quant 5400 BENCH_SCHEDULER=dpm BENCH_STEPS=15 BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=2:10 BENCH_QUANT=w8a8+vae BENCH_QUANT_ACT=0.05 BENCH_REPEATS=5
echo DONE_R4D >> "$ERR"
