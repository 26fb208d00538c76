#!/bin/bash
# Session-8 queue 3 (chains after r3ak): same-chip-day controls + the fused
# Pallas quantize-dense kernel.
#   r3aj/r3ak read ~2% below the r3ae chip-day (quant sampler 2.276/2.288
#   vs 2.327) -- recalibrate with (1) today's exact control and (2) a
#   QUANT_CONV1X1=conv control so the 1x1->dot fix is judged same-day.
#   r3aj's embed re-measure ran at the default bs256 (RTT-skewed) -- redo
#   at bs4096 both routings.
cd /root/repo
OUT=perf/r3al_queue.jsonl
for i in $(seq 1 360); do
  grep -q DONE_R3AK /tmp/r3ak_err.log 2>/dev/null && break
  sleep 60
done
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3al_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3al_err.log
  if out=$(timeout "$to" env "$@" python bench.py 2>>/tmp/r3al_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
# 1. today's exact-path control (band: 2.084-2.088 across chip-days)
run sampler_exact_control 3600 BENCH_REPEATS=5
# 2. quant sampler with the 1x1 fix DISABLED (same-day A/B vs r3aj's 2.276)
run sampler_quant_conv1x1_conv 3600 BENCH_QUANT=w8a8 QUANT_CONV1X1=conv BENCH_REPEATS=5
# 3. fused Pallas quantize-dense (may fail to compile -- that is a result)
run sampler_quant_pallas 3600 BENCH_QUANT=w8a8 QUANT_DENSE_IMPL=pallas BENCH_REPEATS=5
# 4+5. embed at the readable batch, both 1x1 routings (r3ae control: 7267)
run embed_quant_bs4096_dot 3600 BENCH_KIND=embed BENCH_QUANT=w8a8 BENCH_BATCH=4096 BENCH_REPEATS=5
run embed_quant_bs4096_conv 3600 BENCH_KIND=embed BENCH_QUANT=w8a8 BENCH_BATCH=4096 QUANT_CONV1X1=conv BENCH_REPEATS=5
echo DONE_R3AL >> /tmp/r3al_err.log
