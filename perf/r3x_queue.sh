#!/bin/bash
# Session-3 TPU queue, part D (chained after perf/r3w_queue.sh).
# REORDERED (session 4): DeepCache now runs HERE (was part F/r3z) so the
# highest-expected-value results land first; the vmap retries + option
# levers moved to r3z (last). Rationale: interval-2/3 DeepCache is the
# only queued experiment with a >20% expected delta; the option levers
# were all neutral in part 1 and the vmap4 retry alone can eat 90 min.
#
# DeepCache opt-in sampler acceleration (separate metric tag — the exact
# default is untouched). Expected: partial step ≈ 55% of UNet FLOPs at
# depth 1 (level-0 down+up blocks keep the expensive 4096-token
# attention), so interval 2 ≈ +25-30%, interval 3 ≈ +35-45% over the
# 2.08 img/s exact kernel; depth 2 trades more speed for more staleness.
cd /root/repo
OUT=perf/r3x_queue.jsonl
wait_tpu() {
  # TPU-unavailable windows (hours long, e.g. 21:45-01:26) burn variant
  # timeout slots; probe until the backend initializes before each run.
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3x_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3x_err.log
  if out=$(timeout "$to" env BENCH_REPEATS=5 "$@" python bench.py 2>>/tmp/r3x_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
run dc2_d1 3600 BENCH_DEEPCACHE=2
run dc3_d1 3600 BENCH_DEEPCACHE=3
run dc5_d1 3600 BENCH_DEEPCACHE=5
run dc3_d2 3600 BENCH_DEEPCACHE=3 BENCH_DEEPCACHE_DEPTH=2
echo DONE_R3X >> /tmp/r3x_err.log
