#!/bin/bash
# Session-6 resume of perf/r3y_queue.sh: the environment restarted after the
# first variant (sweep21x3_packed, 1.86 img/s landed in r3y_queue.jsonl).
# Runs the remaining three variants with the same protocol.
cd /root/repo
OUT=perf/r3y_queue.jsonl
wait_tpu() {
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
run sweep21x3_classic 3600 BENCH_SWEEP_PROMPTS=21
run sweep8x3_packed 3600 BENCH_SWEEP_PROMPTS=8 BENCH_SWEEP_PACK=1
run sweep8x3_classic 3600 BENCH_SWEEP_PROMPTS=8
echo DONE_R3Y_REST >> /tmp/r3y_err.log
