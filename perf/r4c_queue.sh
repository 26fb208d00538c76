#!/bin/bash
# Round-4 queue 3 (VERDICT r3 #10, timeboxed): the two untried exact-path
# levers — exp2 softmax (FLASH_EXP2) and bf16 exp tile (FLASH_BF16_EXP) in
# the packed flash kernel — vs a same-day exact control; plus exp2 under
# the turbo preset (attention share grows once quant shrinks the convs).
# Bound: exact path is at 87% of its 2.35 img/s attention-at-floor bound;
# softmax VPU cost is roughly half the remaining gap (perf/r3n_ablate).
cd /root/repo
OUT=perf/r4c_queue.jsonl
ERR=/tmp/r4c_err.log
for i in $(seq 1 480); do
  grep -q DONE_R4B /tmp/r4b_err.log 2>/dev/null && break
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
run exact_control_r4c 3600 BENCH_REPEATS=5
run exact_exp2 3600 FLASH_EXP2=1 BENCH_REPEATS=5
run exact_bf16_exp 3600 FLASH_BF16_EXP=1 BENCH_REPEATS=5
run turbo_preset_exp2 5400 BENCH_PRESET=turbo FLASH_EXP2=1 BENCH_REPEATS=5
echo DONE_R4C >> "$ERR"
