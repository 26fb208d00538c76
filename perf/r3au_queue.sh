#!/bin/bash
# Session-9 queue 6 (chains after r3at): int8 flash attention end-to-end.
# The attention core is 30% of the exact sampler batch and runs at 56% of
# its matmul floor; int8 QK/PV (SageAttention-style, ops/flash_attention
# _fwd_kernel_packed_int8) can raise the floor IF the int8 MXU rate
# survives the packed shapes (r3ap probe measures the op-level rates in
# r3as; these rows are the decisive in-program numbers).
# Same-day anchors: exact 2.087, quant-dyn 2.334, quant-static 2.538,
# champion-static 4.198.
cd /root/repo
OUT=perf/r3au_queue.jsonl
for i in $(seq 1 480); do
  grep -q DONE_R3AT /tmp/r3at_err.log 2>/dev/null && break
  sleep 60
done
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3au_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3au_err.log
  if out=$(timeout "$to" env "$@" python bench.py 2>>/tmp/r3au_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
run sampler_attn_int8 3600 BENCH_ATTN=flash_int8 BENCH_REPEATS=5
run sampler_quant_static_attn_int8 3600 BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_ATTN=flash_int8 BENCH_REPEATS=5
run turbo_everything 5400 BENCH_QUANT=w8a8+vae BENCH_QUANT_ACT=0.05 BENCH_ATTN=flash_int8 BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=5:20 BENCH_REPEATS=5
echo DONE_R3AU >> /tmp/r3au_err.log
