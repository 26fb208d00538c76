#!/bin/bash
# Session-10 relaunch: the environment restarted mid-chain (again — see the
# session-5 note), losing r3ar rows 3-5 and all of r3as/r3at/r3au. This one
# script re-runs every remaining row, REORDERED by decision value:
#   1. int8-attention rate probe (r3ap, fixed VMEM specs) — op-level rates
#   2. int8 flash attention END-TO-END (r3au rows) — the decisive numbers
#   3. candidate final turbo stacks (r3at row 1, r3au row 3)
#   4. batch-1 latency with static scales (r3as rows) — sign-flip check
#   5. DPM few-step remnants (r3ar rows 3-5, r3at rows 2-3)
#   6. serve/sweep static rows (r3as rows 3-4) — longest, least decisive
# Rows append to their ORIGINAL per-topic jsonl files so STATUS references
# hold. Same-day anchors already on disk: exact 2.087, quant-dyn 2.334,
# quant-static 2.538, champion-static 4.198 (perf/r3ao_queue.jsonl).
cd /root/repo
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3av_err.log
    sleep 120
  done
}
run() {
  out_file="$1"; tag="$2"; to="$3"; shift 3
  wait_tpu
  echo "=== $tag -> $out_file ($(date +%H:%M:%S))" >> /tmp/r3av_err.log
  if out=$(timeout "$to" env "$@" python bench.py 2>>/tmp/r3av_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$out_file"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$out_file"
  fi
}
# 1. op-level int8 attention rates (fixed probe; r3ao's run crashed on
#    ANY-memspace loads)
wait_tpu
if out=$(timeout 3600 python perf/r3ap_attn_probe.py 2>>/tmp/r3av_err.log); then
  echo "$out" > perf/r3ap_attn_probe.json
else
  echo "{\"error\": \"attn probe exit $?\"}" > perf/r3ap_attn_probe.json
fi
# 2. int8 flash attention end-to-end
run perf/r3au_queue.jsonl sampler_attn_int8 3600 BENCH_ATTN=flash_int8 BENCH_REPEATS=5
run perf/r3au_queue.jsonl sampler_quant_static_attn_int8 3600 BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_ATTN=flash_int8 BENCH_REPEATS=5
# 3. candidate final stacks
run perf/r3at_queue.jsonl turbo_champion_static_vae 5400 BENCH_QUANT=w8a8+vae BENCH_QUANT_ACT=0.05 BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=5:20 BENCH_REPEATS=5
run perf/r3au_queue.jsonl turbo_everything 5400 BENCH_QUANT=w8a8+vae BENCH_QUANT_ACT=0.05 BENCH_ATTN=flash_int8 BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=5:20 BENCH_REPEATS=5
# 4. batch-1 latency, static scales (dynamic w8a8 was NEGATIVE at batch 1)
run perf/r3as_queue.jsonl lat_quant_static 3600 BENCH_KIND=latency BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_REPEATS=5
run perf/r3as_queue.jsonl lat_turbo_quant_static 3600 BENCH_KIND=latency BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=5:20 BENCH_REPEATS=5
# 5. DPM few-step remnants
run perf/r3at_queue.jsonl dpm20_quant_static 3600 BENCH_SCHEDULER=dpm BENCH_STEPS=20 BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_REPEATS=5
run perf/r3at_queue.jsonl dpm20_quant_static_dc3 3600 BENCH_SCHEDULER=dpm BENCH_STEPS=20 BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_DEEPCACHE=3 BENCH_REPEATS=5
run perf/r3ar_queue.jsonl dpm20_quant_dc3 3600 BENCH_SCHEDULER=dpm BENCH_STEPS=20 BENCH_QUANT=w8a8 BENCH_DEEPCACHE=3 BENCH_REPEATS=5
run perf/r3ar_queue.jsonl dpm15_exact 3600 BENCH_SCHEDULER=dpm BENCH_STEPS=15 BENCH_REPEATS=5
run perf/r3ar_queue.jsonl lat_dpm20 3600 BENCH_KIND=latency BENCH_SCHEDULER=dpm BENCH_STEPS=20 BENCH_REPEATS=5
# 6. serve/sweep static rows
run perf/r3as_queue.jsonl serve_quant_static 4800 BENCH_KIND=serve BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_REPEATS=5
run perf/r3as_queue.jsonl sweep_quant_static 5400 BENCH_KIND=sweep BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_REPEATS=5
echo DONE_R3AV >> /tmp/r3av_err.log
