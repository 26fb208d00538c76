#!/bin/bash
# Session-7 queue (runs after r3ae):
#  1. int8 MXU probe take 2 (perf/r3af_int8_probe.py): pure int8 vs bf16 dot
#     rate with the epilogue isolated — the r3ae probe's per-link tanh/requant
#     polluted the measurement (bf16 read 54 TF/s = 27% MFU, so its "int8
#     0.94x" is unreadable).
#  2-4. QUANT=w8a8 on the remaining serving-relevant benches: serve engine
#     (vs 1.91 bf16), true batch-1 latency (vs 0.608 s/img), steady-state
#     sweep+eval (vs 2.04) — the sampler bench already measured +11.5%.
cd /root/repo
OUT=perf/r3af_queue.jsonl
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3af_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3af_err.log
  if out=$(timeout "$to" env "$@" python bench.py 2>>/tmp/r3af_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
wait_tpu
echo "=== int8 probe v2 ($(date +%H:%M:%S))" >> /tmp/r3af_err.log
if out=$(timeout 1800 python perf/r3af_int8_probe.py 2>>/tmp/r3af_err.log); then
  echo "${out%\}}, \"variant\": \"int8_probe_v2\"}" >> "$OUT"
else
  echo "{\"variant\": \"int8_probe_v2\", \"error\": \"exit $?\"}" >> "$OUT"
fi
run serve_quant 3600 BENCH_KIND=serve BENCH_QUANT=w8a8 BENCH_REPEATS=5
run lat_quant 3600 BENCH_KIND=latency BENCH_QUANT=w8a8 BENCH_REPEATS=5
run sweep_quant 4500 BENCH_KIND=sweep BENCH_QUANT=w8a8 BENCH_REPEATS=3
# vmap_ids scaling: 4 identities hit 8.02 img/s aggregate (+75% over the
# single-identity bs2 op point); 8 may still fit under remat (4 without
# remat compile-OOMs at 16.08/15.75G).
run train_vmap8 3600 BENCH_KIND=train BENCH_BATCH=2 BENCH_REMAT=1 BENCH_VMAP_IDS=8
echo DONE_R3AF >> /tmp/r3af_err.log
