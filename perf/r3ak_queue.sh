#!/bin/bash
# Session-8 queue 2 (chains after r3aj -- waits on its DONE marker; never
# edit a queue a running bash may have buffered): mixed dense routing +
# turbo combos on the improved (1x1->dot) quant path.
#   dense probe v5 (perf/r3aj_queue.jsonl): w8a8_dyn 1.13/1.53/1.78x bf16
#   at K=320/640/1280; w8_deq read 1.87x at K=320 (possible fusion
#   artifact) -> QUANT_DENSE_IMPL=mixed routes dequant below K=512.
cd /root/repo
OUT=perf/r3ak_queue.jsonl
for i in $(seq 1 240); do
  grep -q DONE_R3AJ /tmp/r3aj_err.log 2>/dev/null && break
  sleep 60
done
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3ak_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3ak_err.log
  if out=$(timeout "$to" env "$@" python bench.py 2>>/tmp/r3ak_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
# 1. mixed dense routing vs the r3aj int8 control (same tree, same 1x1 fix)
run sampler_quant_mixed 3600 BENCH_QUANT=w8a8 QUANT_DENSE_IMPL=mixed BENCH_REPEATS=5
# 2. quant x DeepCache-3 x cfg_interval(5,20) -- the non-quant combo is the
#    3.72 img/s turbo champion; prior quant x dc3 alone was 3.074
run turbo_quant_dc3_civ520 3600 BENCH_QUANT=w8a8 BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=5:20 BENCH_REPEATS=5
# 3. trifecta re-measure on the improved quant path (control: 3.666)
run turbo_quant_dc5_civ324 3600 BENCH_QUANT=w8a8 BENCH_DEEPCACHE=5 BENCH_CFG_INTERVAL=3:24 BENCH_REPEATS=5
echo DONE_R3AK >> /tmp/r3ak_err.log
