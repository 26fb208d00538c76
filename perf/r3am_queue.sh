#!/bin/bash
# Session-8 queue 4 (chains after r3al): publish numbers on the FINAL
# defaults (QUANT_CONV1X1=conv restored, QUANT_DENSE_IMPL=int8).
#   turbo champion re-run: the 3.799 in r3ak ran with the (since-reverted)
#   1x1 dot routing; the conv default should match or beat it.
#   rolling x quant under staggered arrivals: composition evidence for the
#   two newest serving levers (controls: rolling bf16 stagger 1.261,
#   classic bf16 stagger 0.911 -- perf/r3ai_queue.jsonl).
cd /root/repo
OUT=perf/r3am_queue.jsonl
for i in $(seq 1 360); do
  grep -q DONE_R3AL /tmp/r3al_err.log 2>/dev/null && break
  sleep 60
done
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3am_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3am_err.log
  if out=$(timeout "$to" env "$@" python bench.py 2>>/tmp/r3am_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
run turbo_champion_final 3600 BENCH_QUANT=w8a8 BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=5:20 BENCH_REPEATS=5
run serve_stagger_rolling_quant 5400 BENCH_KIND=serve BENCH_ROLLING=1 BENCH_QUANT=w8a8 BENCH_SERVE_STAGGER_MS=400 BENCH_REPEATS=3
echo DONE_R3AM >> /tmp/r3am_err.log
