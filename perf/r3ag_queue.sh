#!/bin/bash
# Session-7 queue 2 (runs after r3af):
#  1. GEMM probe v3 (perf/r3ag_gemm_probe.py): same-weight chains, cheapest
#     requant, dot vs conv1x1 lowering of the SAME math — resolves probe
#     v2's "bf16 dot = 26% MFU" anomaly and tests whether an int8 MXU fast
#     path exists behind the conv lowering.
#  2. sampler w8a8 with QUANT_DENSE_IMPL=dequant: weight-only int8 denses
#     (bf16 MXU path, exact activations) vs the measured int8-dense 2.327.
#  3. embed at bs4096 quantized: the bf16 73%-MFU headline point (6358);
#     r3ae's bs256 run (4675 vs ~3500 bf16) suggests int8 convs pay.
#  4. latency with dequant denses (int8-dense latency was a big negative:
#     1.438 s vs 0.608 bf16).
cd /root/repo
OUT=perf/r3ag_queue.jsonl
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3ag_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3ag_err.log
  if out=$(timeout "$to" env "$@" python bench.py 2>>/tmp/r3ag_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
wait_tpu
echo "=== gemm probe v3 ($(date +%H:%M:%S))" >> /tmp/r3ag_err.log
if out=$(timeout 1800 python perf/r3ag_gemm_probe.py 2>>/tmp/r3ag_err.log); then
  echo "${out%\}}, \"variant\": \"gemm_probe_v3\"}" >> "$OUT"
else
  echo "{\"variant\": \"gemm_probe_v3\", \"error\": \"exit $?\"}" >> "$OUT"
fi
run quant_dequant 3600 BENCH_QUANT=w8a8 QUANT_DENSE_IMPL=dequant BENCH_REPEATS=5
run embed_quant_4096 3600 BENCH_KIND=embed BENCH_BATCH=4096 BENCH_QUANT=w8a8 BENCH_REPEATS=5
run lat_quant_dequant 3600 BENCH_KIND=latency BENCH_QUANT=w8a8 QUANT_DENSE_IMPL=dequant BENCH_REPEATS=5
echo DONE_R3AG >> /tmp/r3ag_err.log
