#!/bin/bash
# Round-5 queue C: the NEW dpm12 turbo preset (promoted this round,
# pipelines/presets.py) crossed with the two op points the preset frontier
# has not re-measured since the dpm15->dpm12 bump: the full sweep+eval
# harness (BASELINE config 5) and the serving engine. The r3/r4 story —
# "the whole harness rides the turbo at ~97% of the raw sampler" — was
# established at dc3x(5,20)xquant (3.783 img/s, perf/r3an_queue.jsonl);
# these rows restate it at the shipped 10.1 img/s stack for SCALING.md.
#
# Waits for r5b (same TPU, sequential). Restart-proof: resume keyed on
# jsonl rows, all state in perf/.
cd /root/repo
OUT=perf/r5c_queue.jsonl
ERR=perf/r5c_err.log
touch "$OUT"

for i in $(seq 1 400); do
  grep -q DONE_R5B perf/r5b_err.log 2>/dev/null && break
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

# BASELINE config 5 (sweep + CR-FIQA + pose harness) on the shipped turbo
run sweep_preset_turbo 3600 BENCH_KIND=sweep BENCH_PRESET=turbo BENCH_REPEATS=3
# serving engine (HTTP batching, LoRA hot-swap traffic) on the shipped turbo
run serve_preset_turbo 3600 BENCH_KIND=serve BENCH_PRESET=turbo BENCH_REPEATS=3
echo DONE_R5C "$(date +%H:%M:%S)" >> "$ERR"
