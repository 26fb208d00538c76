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
run() {
  tag="$1"; to="$2"; shift 2
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
