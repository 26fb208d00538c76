#!/bin/bash
# Round-4 queue 7: same-round control rows for the remaining BASELINE
# configs. The sample-path controls landed in r4a/r4c; embed and train were
# last measured in round 3 (embed_bs4096 6357.6 emb/s bf16 / 9867 static-
# int8; train_membound 8.9 img/s) — re-measure both on the round-4 tree so
# every BASELINE.json config has a fresh number this round. Runs after the
# r4f latency frontier completes.
cd /root/repo
OUT=perf/r4g_queue.jsonl
ERR=/tmp/r4g_err.log
for i in $(seq 1 480); do
  grep -q DONE_R4F /tmp/r4f_err.log 2>/dev/null && break
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
# BASELINE config (3): batched ArcFace embed extraction — bf16 + static-int8
run embed_control_r4 5400 BENCH_KIND=embed BENCH_REPEATS=5
run embed_static_int8_r4 5400 BENCH_KIND=embed BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_REPEATS=5
# BASELINE config (4): single-identity ID-Booth LoRA fine-tune step
run train_control_r4 5400 BENCH_KIND=train BENCH_REPEATS=5
echo DONE_R4G >> "$ERR"
