#!/bin/bash
# Session-8 queue 1: dense-impl probe at real UNet shapes + w8a8 surfaces
# re-measured after the conv1x1->dot routing fix (rate_probe_v4: int8 dot
# 2.07x bf16, int8 conv1x1 0.77x -- perf/r3ah_queue.jsonl).
cd /root/repo
OUT=perf/r3aj_queue.jsonl
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3aj_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3aj_err.log
  if out=$(timeout "$to" env "$@" python bench.py 2>>/tmp/r3aj_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
# 1. Where does the int8 dense win go? Four impls x three UNet level shapes.
wait_tpu
echo "=== dense probe ($(date +%H:%M:%S))" >> /tmp/r3aj_err.log
if out=$(timeout 2400 python perf/r3aj_dense_probe.py 2>>/tmp/r3aj_err.log); then
  echo "${out%\}}, \"variant\": \"dense_probe_v5\"}" >> "$OUT"
else
  echo "{\"variant\": \"dense_probe_v5\", \"error\": \"exit $?\"}" >> "$OUT"
fi
# 2. w8a8 sampler after the 1x1->dot fix (control: 2.327, perf/r3ae).
run sampler_quant_1x1fix 3600 BENCH_QUANT=w8a8 BENCH_REPEATS=5
# 3. w8a8 embed after the fix -- iresnet down_convs now ride the dot path
#    (control: 7267 img/s bs4096, perf/r3ae).
run embed_quant_1x1fix 3600 BENCH_KIND=embed BENCH_QUANT=w8a8 BENCH_REPEATS=5
echo DONE_R3AJ >> /tmp/r3aj_err.log
