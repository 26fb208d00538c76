#!/bin/bash
# Round-4 queue 1 (VERDICT r3 #1/#6/#8 prep): the UNMEASURED full turbo
# cross — DPM-20 x DeepCache-3 x static-w8a8 x int8-VAE x cfg_interval —
# plus on-chip validation of the new BENCH_PRESET plumbing and the preset
# rows at the latency/sweep/serve op points. Controls from round 3:
# exact 2.086 / dpm20_quant_static_dc3 4.768 (no VAE leg, r3at) /
# turbo_champion_static_vae (30-step analogue) 4.322 / latency dc3+civ
# 0.354 (r3an) / sweep champion 3.783 (r3an).
cd /root/repo
OUT=perf/r4a_queue.jsonl
ERR=/tmp/r4a_err.log
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
# --- the full cross (VERDICT #1: "land the missing composition row") ---
run turbo_vae_dc3_dpm20 5400 BENCH_SCHEDULER=dpm BENCH_STEPS=20 BENCH_QUANT=w8a8+vae BENCH_QUANT_ACT=0.05 BENCH_DEEPCACHE=3 BENCH_REPEATS=5
run turbo_cross_civ_3_13 5400 BENCH_SCHEDULER=dpm BENCH_STEPS=20 BENCH_QUANT=w8a8+vae BENCH_QUANT_ACT=0.05 BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=3:13 BENCH_REPEATS=5
run turbo_cross_civ_5_20 5400 BENCH_SCHEDULER=dpm BENCH_STEPS=20 BENCH_QUANT=w8a8+vae BENCH_QUANT_ACT=0.05 BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=5:20 BENCH_REPEATS=5
# --- chip-day control + self-interpreting extras (VERDICT #6) ---
run exact_control 3600 BENCH_REPEATS=5
# --- preset rows at the other op points ---
run latency_preset 3600 BENCH_KIND=latency BENCH_PRESET=latency BENCH_REPEATS=5
run sweep_preset_turbo 5400 BENCH_KIND=sweep BENCH_PRESET=turbo BENCH_REPEATS=3
run serve_preset_turbo 5400 BENCH_KIND=serve BENCH_PRESET=turbo BENCH_REPEATS=3
# --- BENCH_PRESET plumbing confirm (same program as turbo_vae_dc3_dpm20) ---
run sampler_preset_turbo 5400 BENCH_PRESET=turbo BENCH_REPEATS=5
echo DONE_R4A >> "$ERR"
