#!/bin/bash
# Session-4 TPU queue, part G (after perf/r3z_queue.sh): ToMe token merging
# (opt-in, ops/tome.py). Expected from the r3n attribution: level-0
# self-attention is the bulk of the 1.19 s attention core and the merged
# blocks' projections halve — ratio 0.5 should land +8-15%; the DeepCache
# combination compounds (partial steps keep the level-0 blocks ToMe
# accelerates). Separate metric tag; the exact default is untouched.
cd /root/repo
OUT=perf/r3aa_queue.jsonl
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3aa_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3aa_err.log
  if out=$(timeout "$to" env BENCH_REPEATS=5 "$@" python bench.py 2>>/tmp/r3aa_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
run tome05 3600 BENCH_TOME=0.5
run tome05_full 3600 BENCH_TOME=0.5 BENCH_TOME_OPS=attn+xattn+mlp
run tome03 3600 BENCH_TOME=0.3
run tome05_dc3 3600 BENCH_TOME=0.5 BENCH_DEEPCACHE=3
echo DONE_R3AA >> /tmp/r3aa_err.log
