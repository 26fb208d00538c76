#!/bin/bash
# Session-3 TPU queue, part E (after perf/r3x_queue.sh):
# variant-packed sweep at the REFERENCE op point (3 model variants × 21
# prompts per identity, `inference_ID-Booth.py:97,113`).
#  - control: per-variant batching — 3×(2×bs8+bs5) = 9 batches/identity
#    (72 slots, 9 padded) + per-variant ragged-tail program
#  - packed: (variant, prompt) pairs packed into ⌈63/8⌉ = 8 full batches
#    with per-sample adapters + per-prompt noise (expect ~11% fewer UNet
#    invocations; per-sample rank-4 adapter cost measured ~free in the
#    multi_lora serve bench)
#  - also the 8-prompt × 3-variant point (24 slots → 3 full batches both
#    ways: isolates the per-sample-adapter overhead from the packing win)
cd /root/repo
OUT=perf/r3y_queue.jsonl
wait_tpu() {
  # TPU-unavailable windows (hours long, e.g. 21:45-01:26) burn variant
  # timeout slots; probe until the backend initializes before each run.
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3y_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3y_err.log
  if out=$(timeout "$to" env BENCH_KIND=sweep BENCH_SWEEP_MODELS=3 "$@" python bench.py 2>>/tmp/r3y_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
run sweep21x3_packed 3600 BENCH_SWEEP_PROMPTS=21 BENCH_SWEEP_PACK=1
run sweep21x3_classic 3600 BENCH_SWEEP_PROMPTS=21
run sweep8x3_packed 3600 BENCH_SWEEP_PROMPTS=8 BENCH_SWEEP_PACK=1
run sweep8x3_classic 3600 BENCH_SWEEP_PROMPTS=8
echo DONE_R3Y >> /tmp/r3y_err.log
