#!/bin/bash
# Session-5 queue: true batch-1 latency (BASELINE "p50 per-image latency") —
# sequential control vs the parallel-in-time Picard sampler
# (diffusion/parallel_sampler.py, ParaDiGMS arXiv:2305.16317) at three
# (window, tolerance) points. Expectation is genuinely uncertain on ONE
# v5e chip: the win requires the UNet at batch 2 (bs1+CFG) to be badly
# MXU-underutilized relative to batch 2W; the measured bs8 program runs at
# ~50% MFU, so a W=8 iteration costs ~0.131 s — parallel wins only if
# Picard depth < seq_latency/0.131. A measured negative is an acceptable
# outcome (the multi-chip window sharding is where the design must win).
cd /root/repo
OUT=perf/r3ac_queue.jsonl
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3ac_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3ac_err.log
  if out=$(timeout "$to" env BENCH_KIND=latency BENCH_REPEATS=5 "$@" python bench.py 2>>/tmp/r3ac_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
run lat_seq 3600
run lat_para_w8_t01 3600 BENCH_PARA_WINDOW=8 BENCH_PARA_TOL=0.1
run lat_para_w8_t02 3600 BENCH_PARA_WINDOW=8 BENCH_PARA_TOL=0.2
run lat_para_w16_t01 3600 BENCH_PARA_WINDOW=16 BENCH_PARA_TOL=0.1
echo DONE_R3AC >> /tmp/r3ac_err.log
