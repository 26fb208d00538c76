#!/bin/bash
# Round-4 queue 8 (consolidates the former r4f/r4g plans after r4d's
# results): the DPM-15 step frontier won big — dpm15 x dc3 x civ(2,10) x
# static-w8a8+vae = 7.663 img/s (+22.5% over the shipped turbo 6.254,
# perf/r4d_queue.jsonl) — and dc4 edged dc3 under turbo (6.363 vs 6.254).
# This queue measures, in decision order:
#   1. the unmeasured dpm15 x dc4 cross (candidate new turbo champion)
#   2. the dpm12 frontier point (informational; proportional civ ~(2,8))
#   3. the batch-1 latency frontier (former r4f): shipped latency preset
#      control + the DPM-20 x dc3 x civ(3,13) bf16 candidate
#   4. quality rows for every candidate above (one accel-report process;
#      the r4e process already covers turbo/dc2/dc4/dpm15(dc3)/latency)
#   5. fresh round-4 controls for the embed and train BASELINE configs
#      (former r4g)
cd /root/repo
OUT=perf/r4h_queue.jsonl
ERR=/tmp/r4h_err.log
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
# 1. candidate champion cross: DPM-15 x DeepCache-4 x civ(2,10) x static quant
run dpm15_dc4_civ_quant 5400 BENCH_SCHEDULER=dpm BENCH_STEPS=15 BENCH_DEEPCACHE=4 BENCH_CFG_INTERVAL=2:10 BENCH_QUANT=w8a8+vae BENCH_QUANT_ACT=0.05 BENCH_REPEATS=5
# 2. step frontier continues: DPM-12, proportional guidance interval
run dpm12_dc3_civ_quant 5400 BENCH_SCHEDULER=dpm BENCH_STEPS=12 BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=2:8 BENCH_QUANT=w8a8+vae BENCH_QUANT_ACT=0.05 BENCH_REPEATS=5
# 3. batch-1 latency frontier (former r4f)
run latency_preset_control 5400 BENCH_KIND=latency BENCH_PRESET=latency BENCH_REPEATS=5
run latency_dpm20_dc3_civ 5400 BENCH_KIND=latency BENCH_SCHEDULER=dpm BENCH_STEPS=20 BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=3:13 BENCH_REPEATS=5
# 4. quality rows for the candidates (PSNR vs 30-step exact, bench op point)
wait_tpu
echo "=== r4h quality: dpm15xdc4, dpm12, latency-dpm20 ($(date +%H:%M:%S))" >> "$ERR"
timeout 10800 python perf/accel_report_onchip.py \
  --mode 'scheduler=dpm:15+deepcache=4+cfg_interval=2:10+quantize=w8a8,vae:static:8' \
  --mode 'scheduler=dpm:12+deepcache=3+cfg_interval=2:8+quantize=w8a8,vae:static:8' \
  --mode 'scheduler=dpm:20+deepcache=3+cfg_interval=3:13' \
  --out perf/r4h_quality.jsonl 2>>"$ERR" \
  || echo "{\"variant\": \"r4h_quality\", \"error\": \"exit $?\"}" >> perf/r4h_quality.jsonl
# 5. fresh round-4 controls for the remaining BASELINE configs (former r4g)
run embed_control_r4 5400 BENCH_KIND=embed BENCH_REPEATS=5
run embed_static_int8_r4 5400 BENCH_KIND=embed BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_REPEATS=5
run train_control_r4 5400 BENCH_KIND=train BENCH_REPEATS=5
echo DONE_R4H >> "$ERR"
