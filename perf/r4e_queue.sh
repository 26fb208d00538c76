#!/bin/bash
# Round-4 queue 5: on-chip quality gates for the r4d frontier probes.
# Any preset change (DeepCache 2/4 around the shipped dc3, the DPM-15
# step frontier) must show its accel-report quality next to its perf row
# — perf/accel_report_onchip.py measures PSNR-vs-exact at the bench op
# point (512x512, 30-step DDPM exact reference, bf16). Two processes so
# a compile-relay hiccup can't take out the whole sweep; within each,
# the exact program compiles once and is reused across modes.
cd /root/repo
OUT=perf/r4e_quality.jsonl
ERR=/tmp/r4e_err.log
for i in $(seq 1 480); do
  grep -q DONE_R4D /tmp/r4d_err.log 2>/dev/null && break
  sleep 60
done
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> "$ERR"
    sleep 120
  done
}
TURBO='scheduler=dpm:20+deepcache=3+cfg_interval=3:13+quantize=w8a8,vae:static:8'
DC2='scheduler=dpm:20+deepcache=2+cfg_interval=3:13+quantize=w8a8,vae:static:8'
DC4='scheduler=dpm:20+deepcache=4+cfg_interval=3:13+quantize=w8a8,vae:static:8'
DPM15='scheduler=dpm:15+deepcache=3+cfg_interval=2:10+quantize=w8a8,vae:static:8'
LATENCY='deepcache=3+cfg_interval=5:20'

wait_tpu
echo "=== r4e proc 1: turbo + dc neighbours ($(date +%H:%M:%S))" >> "$ERR"
timeout 10800 python perf/accel_report_onchip.py \
  --mode "$TURBO" --mode "$DC2" --mode "$DC4" --out "$OUT" 2>>"$ERR" \
  || echo "{\"variant\": \"r4e_proc1\", \"error\": \"exit $?\"}" >> "$OUT"

wait_tpu
echo "=== r4e proc 2: dpm15 + latency stack ($(date +%H:%M:%S))" >> "$ERR"
timeout 10800 python perf/accel_report_onchip.py \
  --mode "$DPM15" --mode "$LATENCY" --out "$OUT" 2>>"$ERR" \
  || echo "{\"variant\": \"r4e_proc2\", \"error\": \"exit $?\"}" >> "$OUT"
echo DONE_R4E >> "$ERR"
