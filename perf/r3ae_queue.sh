#!/bin/bash
# Session-6 queue: opt-in w8a8 int8 quantization (ops/quant.py).
#  1. MXU probe: int8 vs bf16 GEMM + conv at UNet shapes (is the 2x real?)
#  2. default sampler with QUANT=w8a8 (the conv/GEMM bucket is ~70% of the
#     step; if int8 hits 2x on it, bound ~ 8/(3.92-2.7/2) ≈ +50%... in
#     practice quantize/dequantize VPU passes eat into it)
#  3. QUANT x DeepCache-3 combo (approximation modes compose)
#  4. embed path QUANT=w8a8 (bf16 ceiling was 73% MFU / 6360 img/s — int8
#     doubles the roof; dynamic-quant overhead is per-image, small at 112^2)
cd /root/repo
OUT=perf/r3ae_queue.jsonl
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3ae_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3ae_err.log
  if out=$(timeout "$to" env "$@" python bench.py 2>>/tmp/r3ae_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
wait_tpu
echo "=== probe ($(date +%H:%M:%S))" >> /tmp/r3ae_err.log
if out=$(timeout 1800 python perf/r3ae_quant_probe.py 2>>/tmp/r3ae_err.log); then
  echo "${out%\}}, \"variant\": \"quant_probe\"}" >> "$OUT"
else
  echo "{\"variant\": \"quant_probe\", \"error\": \"exit $?\"}" >> "$OUT"
fi
run quant_w8a8 3600 BENCH_QUANT=w8a8 BENCH_REPEATS=5
run quant_dc3 3600 BENCH_QUANT=w8a8 BENCH_DEEPCACHE=3 BENCH_REPEATS=5
run embed_quant 3600 BENCH_KIND=embed BENCH_QUANT=w8a8 BENCH_REPEATS=5
# max-turbo trifecta: every composable opt-in acceleration at once
run quant_dc5_civ 3600 BENCH_QUANT=w8a8 BENCH_DEEPCACHE=5 BENCH_CFG_INTERVAL=3:24 BENCH_REPEATS=5
echo DONE_R3AE >> /tmp/r3ae_err.log
