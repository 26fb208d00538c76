#!/bin/bash
# Session-9 queue 1: STATIC activation scales for w8a8 (the one quant lever
# the session-8 agenda left open). Dynamic act-quant's amax reduce + extra
# HBM passes were measured as the reason int8 dense washes at small K
# (perf/r3aj); a static per-tensor scale makes the quantize pure elementwise
# (fusable into x's producer, which then WRITES int8 — half the bytes).
# BENCH_QUANT_ACT stamps a constant scale on every site: perf-equivalent to
# a calibrated tree (same program, different constants).
#   Controls re-measured same-day: exact band 2.084-2.088, quant-dynamic
#   band 2.28-2.33, embed-quant bs4096 band ~7000-7270.
cd /root/repo
OUT=perf/r3ao_queue.jsonl
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3ao_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3ao_err.log
  if out=$(timeout "$to" env "$@" python bench.py 2>>/tmp/r3ao_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
# same-day controls first, then the static probes
run sampler_exact_control 3600 BENCH_REPEATS=5
run sampler_quant_dyn_control 3600 BENCH_QUANT=w8a8 BENCH_REPEATS=5
run sampler_quant_static 3600 BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_REPEATS=5
run embed_quant_dyn_control 3600 BENCH_KIND=embed BENCH_QUANT=w8a8 BENCH_BATCH=4096 BENCH_REPEATS=5
run embed_quant_static 3600 BENCH_KIND=embed BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_BATCH=4096 BENCH_REPEATS=5
# if static pays on the sampler, the champion combo inherits it: measure the
# turbo stack with static scales (control: 3.891, perf/r3am_queue.jsonl)
run turbo_champion_static 5400 BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=5:20 BENCH_REPEATS=5
# SageAttention feasibility: int8 vs bf16 MXU rate at attention tile shapes
# (Pallas, VMEM-resident, differenced chains) — see the probe's docstring
# for the pre-registered decision rule.
wait_tpu
if out=$(timeout 3600 python perf/r3ap_attn_probe.py 2>>/tmp/r3ao_err.log); then
  echo "$out" > perf/r3ap_attn_probe.json
else
  echo "{\"error\": \"attn probe exit $?\"}" > perf/r3ap_attn_probe.json
fi
echo DONE_R3AO >> /tmp/r3ao_err.log
