#!/bin/bash
# Session-9 queue 2 (chains after r3ao): w8a8+vae — int8 VAE decoder body.
# The VAE decode is ~5% of the EXACT sampler but a growing share under the
# turbo modes (DeepCache/cfg-interval/quant shrink only UNet work), so the
# pay hypothesis is: small-to-neutral on the plain quant sampler, positive
# on the turbo champion. Same-day controls: exact 2.087, quant-dyn 2.334
# (r3ao rows 1-2); champion control 3.891 (r3am — re-measured here since
# chip-days drift).
cd /root/repo
OUT=perf/r3aq_queue.jsonl
for i in $(seq 1 360); do
  grep -q DONE_R3AO /tmp/r3ao_err.log 2>/dev/null && break
  sleep 60
done
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3aq_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3aq_err.log
  if out=$(timeout "$to" env "$@" python bench.py 2>>/tmp/r3aq_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
run sampler_quant_vae 3600 BENCH_QUANT=w8a8+vae BENCH_REPEATS=5
run turbo_champion_control 5400 BENCH_QUANT=w8a8 BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=5:20 BENCH_REPEATS=5
run turbo_champion_vae 5400 BENCH_QUANT=w8a8+vae BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=5:20 BENCH_REPEATS=5
echo DONE_R3AQ >> /tmp/r3aq_err.log
