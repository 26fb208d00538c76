#!/bin/bash
# Round-4 queue 9: consolidated replacement for r4e+r4h after a machine
# restart wiped their /tmp sentinels before either ran. Ordered by
# decision value per TPU-minute (this session has ~2h wall clock):
#   1. quality proc A — turbo control + DPM-15xdc3 + DPM-15xdc4: gates
#      the candidate turbo upgrade (dpm15xdc3xciv(2,10)xquant measured
#      7.663 img/s in r4d, +22.5% over the shipped turbo 6.254).
#   2. bench: the unmeasured dpm15 x dc4 perf cross (champion candidate).
#   3. fresh round-4 controls for the embed and train BASELINE configs.
#   4. quality proc B — dpm12 + latency-dpm20 candidates.
#   5. dpm12 frontier bench + batch-1 latency frontier benches.
# Whatever lands before end-of-session is committed; later rows are
# bonus. Each run gated on TPU availability; errors recorded as rows.
cd /root/repo
OUT=perf/r4i_queue.jsonl
QOUT=perf/r4i_quality.jsonl
ERR=/tmp/r4i_err.log
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
TURBO='scheduler=dpm:20+deepcache=3+cfg_interval=3:13+quantize=w8a8,vae:static:8'
DPM15DC3='scheduler=dpm:15+deepcache=3+cfg_interval=2:10+quantize=w8a8,vae:static:8'
DPM15DC4='scheduler=dpm:15+deepcache=4+cfg_interval=2:10+quantize=w8a8,vae:static:8'
DPM12='scheduler=dpm:12+deepcache=3+cfg_interval=2:8+quantize=w8a8,vae:static:8'
LATDPM20='scheduler=dpm:20+deepcache=3+cfg_interval=3:13'
LATENCY='deepcache=3+cfg_interval=5:20'

# 1. quality gates for the turbo-upgrade decision (one process: exact
#    compiled once, reused across modes)
wait_tpu
echo "=== r4i quality proc A: turbo + dpm15 candidates ($(date +%H:%M:%S))" >> "$ERR"
timeout 7200 python perf/accel_report_onchip.py \
  --mode "$TURBO" --mode "$DPM15DC3" --mode "$DPM15DC4" --out "$QOUT" 2>>"$ERR" \
  || echo "{\"variant\": \"r4i_qualA\", \"error\": \"exit $?\"}" >> "$QOUT"
echo DONE_QUAL_A >> "$ERR"

# 2. the unmeasured champion cross
run dpm15_dc4_civ_quant 3600 BENCH_SCHEDULER=dpm BENCH_STEPS=15 BENCH_DEEPCACHE=4 BENCH_CFG_INTERVAL=2:10 BENCH_QUANT=w8a8+vae BENCH_QUANT_ACT=0.05 BENCH_REPEATS=5

# 3. fresh round-4 controls for the other BASELINE configs
run embed_control_r4 3600 BENCH_KIND=embed BENCH_REPEATS=5
run train_control_r4 3600 BENCH_KIND=train BENCH_REPEATS=5

# 4. quality proc B: remaining candidates
wait_tpu
echo "=== r4i quality proc B: dpm12 + latency candidates ($(date +%H:%M:%S))" >> "$ERR"
timeout 7200 python perf/accel_report_onchip.py \
  --mode "$DPM12" --mode "$LATDPM20" --mode "$LATENCY" --out "$QOUT" 2>>"$ERR" \
  || echo "{\"variant\": \"r4i_qualB\", \"error\": \"exit $?\"}" >> "$QOUT"

# 5. frontier benches (informational)
run dpm12_dc3_civ_quant 3600 BENCH_SCHEDULER=dpm BENCH_STEPS=12 BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=2:8 BENCH_QUANT=w8a8+vae BENCH_QUANT_ACT=0.05 BENCH_REPEATS=5
run latency_preset_control 3600 BENCH_KIND=latency BENCH_PRESET=latency BENCH_REPEATS=5
run latency_dpm20_dc3_civ 3600 BENCH_KIND=latency BENCH_SCHEDULER=dpm BENCH_STEPS=20 BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=3:13 BENCH_REPEATS=5
run embed_static_int8_r4 3600 BENCH_KIND=embed BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_REPEATS=5
echo DONE_R4I >> "$ERR"
