#!/bin/bash
# Round-4 queue 2 (VERDICT r3 #8): rolling serving x DPM few-step x quant
# stacked on the serving path, p50/p95 request latency under staggered
# arrivals. Controls from round 3 (perf/r3am/r3ai): rolling+quant ddpm-30
# staggered 1.385 img/s p50 6.35 s p95 8.09 s; classic bf16 0.911/8.52/12.6.
cd /root/repo
OUT=perf/r4b_queue.jsonl
ERR=/tmp/r4b_err.log
for i in $(seq 1 480); do
  grep -q DONE_R4A /tmp/r4a_err.log 2>/dev/null && break
  sleep 60
done
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
# the three levers stacked on the serving path, staggered arrivals
run serve_rolling_dpm20_quant_stagger 5400 BENCH_KIND=serve BENCH_ROLLING=1 BENCH_SCHEDULER=dpm BENCH_STEPS=20 BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_SERVE_STAGGER_MS=400 BENCH_REPEATS=3
# classic engine, same levers, same traffic (the fair comparison)
run serve_classic_dpm20_quant_stagger 5400 BENCH_KIND=serve BENCH_SCHEDULER=dpm BENCH_STEPS=20 BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_SERVE_STAGGER_MS=400 BENCH_REPEATS=3
# rolling dpm20 quant under uniform bursts (throughput shape)
run serve_rolling_dpm20_quant_burst 5400 BENCH_KIND=serve BENCH_ROLLING=1 BENCH_SCHEDULER=dpm BENCH_STEPS=20 BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_REPEATS=3
echo DONE_R4B >> "$ERR"
