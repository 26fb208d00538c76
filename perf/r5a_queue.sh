#!/bin/bash
# Round-5 queue A. Decision order:
#   1. dpm12 x dc4 perf cross — the throughput-champion candidate
#      (dpm12xdc3 = 9.356 img/s and dpm15xdc4 = +4% over dc3 were both
#      measured in r4i; their composition was not).
#   2. quality proc Q1 — the champion candidate's gate + the VERDICT r4 #4
#      calibration brackets: the unrelated-sample PSNR floor (exact seed
#      vs seed+1) and a known-bad mode (dpm:4 bare), so the ~18 dB preset
#      probes finally have a scale; + int8-flash-attention AT the turbo op
#      point (built r3, never composed — VERDICT r4 #3 lever).
#   3. remaining frontier benches: int8-attn turbo, bs16-at-dpm15 turbo,
#      dc5, fresh exact control.
#   4. quality proc Q2 — multi-prompt (batch 4) coverage of the champion,
#      and the batch-1 latency candidate at its own op point.
#   5. post-bump preset validation row (BENCH_PRESET=turbo re-measures
#      whatever pipelines/presets.py ships by then).
#
# RESTART-PROOF (VERDICT r4 #5): all state lives in perf/ (no /tmp
# sentinels); every row is keyed by a tag and skipped when a non-error
# row with that tag already exists in the output jsonl, so rerunning
# this script resumes instead of restarting. Error rows do NOT block a
# retry. Each run gated on TPU availability.
cd /root/repo
OUT=perf/r5a_queue.jsonl
QOUT=perf/r5a_quality.jsonl
ERR=perf/r5a_err.log
touch "$OUT" "$QOUT"

wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> "$ERR"
    sleep 120
  done
}

have_row() {  # $1=file $2=tag-field $3=tag -> 0 if a non-error row exists
  grep "\"$2\": \"$3\"" "$1" 2>/dev/null | grep -qv '"error"'
}

run() {
  tag="$1"; to="$2"; shift 2
  have_row "$OUT" variant "$tag" && { echo "skip $tag (done)" >> "$ERR"; return 0; }
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> "$ERR"
  if out=$(timeout "$to" env "$@" python bench.py 2>>"$ERR"); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}

qrun() {  # $1=tag $2=timeout, rest = accel_report_onchip args
  tag="$1"; to="$2"; shift 2
  have_row "$QOUT" qtag "$tag" && { echo "skip $tag (done)" >> "$ERR"; return 0; }
  wait_tpu
  echo "=== qual $tag ($(date +%H:%M:%S))" >> "$ERR"
  timeout "$to" python perf/accel_report_onchip.py --qtag "$tag" --out "$QOUT" "$@" 2>>"$ERR" \
    || echo "{\"qtag\": \"$tag\", \"error\": \"exit $?\"}" >> "$QOUT"
}

DPM12DC4='scheduler=dpm:12+deepcache=4+cfg_interval=2:8+quantize=w8a8,vae:static:8'
DPM12DC5='scheduler=dpm:12+deepcache=5+cfg_interval=2:8+quantize=w8a8,vae:static:8'
TURBO15='scheduler=dpm:15+deepcache=3+cfg_interval=2:10+quantize=w8a8,vae:static:8'
TURBO15INT8A="$TURBO15+attn=flash_int8"
LATDPM20='scheduler=dpm:20+deepcache=3+cfg_interval=3:13'

# 1. champion-candidate perf cross
run dpm12_dc4_civ_quant 3600 BENCH_SCHEDULER=dpm BENCH_STEPS=12 BENCH_DEEPCACHE=4 BENCH_CFG_INTERVAL=2:8 BENCH_QUANT=w8a8+vae BENCH_QUANT_ACT=0.05 BENCH_REPEATS=5

# 2. quality proc Q1: champion gate + calibration brackets + int8-attn
qrun q1_champion_floor_int8attn 9000 --floor \
  --mode "$DPM12DC4" --mode "scheduler=dpm:4" --mode "$TURBO15INT8A"

# 3. frontier benches
run turbo15_int8attn 3600 BENCH_SCHEDULER=dpm BENCH_STEPS=15 BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=2:10 BENCH_QUANT=w8a8+vae BENCH_QUANT_ACT=0.05 BENCH_ATTN=flash_int8 BENCH_REPEATS=5
run turbo15_bs16 3600 BENCH_SCHEDULER=dpm BENCH_STEPS=15 BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=2:10 BENCH_QUANT=w8a8+vae BENCH_QUANT_ACT=0.05 BENCH_BATCH=16 BENCH_SWEEP_PROMPTS=16 BENCH_REPEATS=5
run exact_control_r5 3600 BENCH_REPEATS=5
run dpm12_dc5_civ_quant 3600 BENCH_SCHEDULER=dpm BENCH_STEPS=12 BENCH_DEEPCACHE=5 BENCH_CFG_INTERVAL=2:8 BENCH_QUANT=w8a8+vae BENCH_QUANT_ACT=0.05 BENCH_REPEATS=5

# 4. quality proc Q2: multi-prompt champion coverage + latency op point
qrun q2_champion_bs4 9000 --batch 4 --mode "$DPM12DC4" --mode "$TURBO15"
qrun q3_latency_bs1 7200 --batch 1 --floor --mode "$LATDPM20" --mode "deepcache=3+cfg_interval=5:20"

# 5. shipped-preset validation (whatever presets.py says by now)
run preset_turbo_r5 3600 BENCH_PRESET=turbo BENCH_REPEATS=5
run preset_latency_r5 3600 BENCH_KIND=latency BENCH_PRESET=latency BENCH_REPEATS=5
echo DONE_R5A "$(date +%H:%M:%S)" >> "$ERR"
