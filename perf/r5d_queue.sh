#!/bin/bash
# Round-5 queue D: the batch-1 LATENCY frontier below 20 steps. The
# shipped latency preset is DPM-20 x dc3 x civ(3,13) = 0.259 s/img
# (perf/r5a_queue.jsonl); the throughput frontier moved to 12 steps at
# quality parity (shipped turbo), so the same op point sequential is the
# obvious next latency candidate. Quant stays OFF at batch 1 (measured
# negative: dynamic-quant ops dominate a latency-bound program,
# perf/r3an_queue.jsonl). INFORMATIONAL rows like r5b: promotion into the
# preset goes through the floor-relative quality gate on real weights.
#
# Restart-proof: resume keyed on jsonl rows, all state in perf/.
cd /root/repo
OUT=perf/r5d_queue.jsonl
ERR=perf/r5d_err.log
touch "$OUT"

wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> "$ERR"
    sleep 120
  done
}

have_row() {
  grep "\"variant\": \"$1\"" "$OUT" 2>/dev/null | grep -qv '"error"'
}

run() {
  tag="$1"; to="$2"; shift 2
  have_row "$tag" && { echo "skip $tag (done)" >> "$ERR"; return 0; }
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> "$ERR"
  if out=$(timeout "$to" env "$@" python bench.py 2>>"$ERR"); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}

# batch-1 sequential at the r4-certified quality point (dpm15 turbo levers, no quant)
run latency_dpm15_dc3_civ 3600 BENCH_KIND=latency BENCH_SCHEDULER=dpm BENCH_STEPS=15 BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=2:10 BENCH_REPEATS=5
# batch-1 sequential at the shipped-turbo op point (dpm12 x dc4, no quant)
run latency_dpm12_dc4_civ 3600 BENCH_KIND=latency BENCH_SCHEDULER=dpm BENCH_STEPS=12 BENCH_DEEPCACHE=4 BENCH_CFG_INTERVAL=2:8 BENCH_REPEATS=5
echo DONE_R5D "$(date +%H:%M:%S)" >> "$ERR"
