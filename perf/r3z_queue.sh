#!/bin/bash
# Session-3 TPU queue, part F (after perf/r3y_queue.sh).
# REORDERED (session 4): this is the old part-D content (vmap train
# retries + remaining XLA option levers); DeepCache moved up to r3x.
#  - train_vmap4 retry at timeout 5400 (3600 was exceeded — the K=4
#    vmapped train program's remote compile alone can pass an hour).
#  - vmap2's r3v slot was consumed by the TPU-unavailable window
#    (21:45-01:26, "TPU backend setup/compile error (Unavailable)") that
#    killed r3u — not by slow compile; re-measure.
#  - trimmed option sweep: part-1 options all measured neutral, so keep
#    only the 4 most plausible levers (control = the well-established
#    2.084-2.086 default, re-measured in every recent queue).
cd /root/repo
OUT=perf/r3z_queue.jsonl
wait_tpu() {
  # TPU-unavailable windows (hours long, e.g. 21:45-01:26) burn variant
  # timeout slots; probe until the backend initializes before each run.
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3z_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3z_err.log
  if out=$(timeout "$to" env BENCH_REPEATS=5 "$@" python bench.py 2>>/tmp/r3z_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
run train_vmap4_retry 5400 BENCH_KIND=train BENCH_BATCH=2 BENCH_REMAT=1 BENCH_VMAP_IDS=4 BENCH_REPEATS=3
run train_vmap2_retry 5400 BENCH_KIND=train BENCH_BATCH=2 BENCH_REMAT=1 BENCH_VMAP_IDS=2 BENCH_REPEATS=3
run dot_dot 2400 XLA_COMPILER_OPTIONS='{"xla_tpu_dot_dot_fusion":"true"}'
run rwb_off 2400 XLA_COMPILER_OPTIONS='{"xla_tpu_rwb_fusion":"false"}'
run v2v_dma 2400 XLA_COMPILER_OPTIONS='{"xla_tpu_enable_vmem_to_vmem_dmas":"true"}'
run licm_2 2400 XLA_COMPILER_OPTIONS='{"xla_tpu_licm_size_inflation_ratio":"2.0"}'
echo DONE_R3Z >> /tmp/r3z_err.log
