#!/bin/bash
# Round-5 queue B: the step frontier below 12 — the ONLY lever left that
# moves toward the >=30 img/s (v5p) north star (VERDICT r4 #3). dpm15->12
# measured ~linear in steps (7.978 -> 10.117 at dc4), so the table in
# docs/SCALING.md needs the dpm10/dpm8 rows to state where the v5p
# projection crosses 30. These are INFORMATIONAL rows: the random-weights
# probe cannot rank few-step fidelity (measured: bare dpm:4 probes at
# 18.8 dB, ABOVE the champion's 18.15 — perf/r5a_quality.jsonl), so
# promotion below 12 steps waits for real weights; the perf frontier is
# still measurable now.
#
# Waits for r5a to finish (same TPU, sequential), then uses the same
# resume-keyed row convention. Restart-proof: state in perf/ only.
cd /root/repo
OUT=perf/r5b_queue.jsonl
ERR=perf/r5b_err.log
touch "$OUT"

for i in $(seq 1 400); do
  grep -q DONE_R5A perf/r5a_err.log 2>/dev/null && break
  sleep 60
done

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

# step frontier at the champion's other levers (dc4 x civ-proportional x quant)
run dpm10_dc4_civ_quant 3600 BENCH_SCHEDULER=dpm BENCH_STEPS=10 BENCH_DEEPCACHE=4 BENCH_CFG_INTERVAL=2:7 BENCH_QUANT=w8a8+vae BENCH_QUANT_ACT=0.05 BENCH_REPEATS=5
run dpm8_dc4_civ_quant 3600 BENCH_SCHEDULER=dpm BENCH_STEPS=8 BENCH_DEEPCACHE=4 BENCH_CFG_INTERVAL=1:6 BENCH_QUANT=w8a8+vae BENCH_QUANT_ACT=0.05 BENCH_REPEATS=5
echo DONE_R5B "$(date +%H:%M:%S)" >> "$ERR"
