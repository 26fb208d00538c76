#!/bin/bash
# Session-3 TPU queue, part C (runs after perf/r3v_queue.sh):
# heterogeneous-LoRA serving under adapter-diverse traffic.
#  - 16 distinct adapters round-robin, burst = 16 requests, batch 8:
#    the classic engine fragments into 16 single-request padded batches;
#    multi_lora packs 2 full batches — the per-sample-adapter win.
#  - multi_lora on the CLASSIC 2-lora traffic = overhead check vs the
#    known-good 1.91 img/s serve number.
cd /root/repo
OUT=perf/r3w_queue.jsonl
wait_tpu() {
  # TPU-unavailable windows (hours long, e.g. 21:45-01:26) burn variant
  # timeout slots; probe until the backend initializes before each run.
  for i in $(seq 1 45); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3w_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3w_err.log
  if out=$(timeout "$to" env "$@" python bench.py 2>>/tmp/r3w_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
run serve_16lora_multi 3600 BENCH_KIND=serve BENCH_SERVE_LORAS=16 BENCH_MULTILORA=1
run serve_16lora_classic 3600 BENCH_KIND=serve BENCH_SERVE_LORAS=16
run serve_multi_uniform 3600 BENCH_KIND=serve BENCH_MULTILORA=1
echo DONE_R3W >> /tmp/r3w_err.log
