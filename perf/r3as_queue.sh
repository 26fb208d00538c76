#!/bin/bash
# Session-9 queue 4 (chains after r3ar): (a) the FIXED int8-attention rate
# probe (r3ao's run crashed on ANY-memspace loads; VMEM specs now, CPU
# interpret-smoked); (b) batch-1 latency with STATIC act scales — dynamic
# w8a8 was NEGATIVE at batch 1 (1.438 vs 0.608 bf16; the quantize ops
# dominate a latency-bound program) and static scales remove exactly those
# ops, so the sign may flip; (c) serve/sweep with static scales (dyn
# controls 2.183 / 2.255-band from r3af).
cd /root/repo
OUT=perf/r3as_queue.jsonl
for i in $(seq 1 480); do
  grep -q DONE_R3AR /tmp/r3ar_err.log 2>/dev/null && break
  sleep 60
done
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3as_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3as_err.log
  if out=$(timeout "$to" env "$@" python bench.py 2>>/tmp/r3as_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
wait_tpu
if out=$(timeout 3600 python perf/r3ap_attn_probe.py 2>>/tmp/r3as_err.log); then
  echo "$out" > perf/r3ap_attn_probe.json
else
  echo "{\"error\": \"attn probe exit $?\"}" > perf/r3ap_attn_probe.json
fi
run lat_quant_static 3600 BENCH_KIND=latency BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_REPEATS=5
run lat_turbo_quant_static 3600 BENCH_KIND=latency BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_DEEPCACHE=3 BENCH_CFG_INTERVAL=5:20 BENCH_REPEATS=5
run serve_quant_static 4800 BENCH_KIND=serve BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_REPEATS=5
run sweep_quant_static 5400 BENCH_KIND=sweep BENCH_QUANT=w8a8 BENCH_QUANT_ACT=0.05 BENCH_REPEATS=5
echo DONE_R3AS >> /tmp/r3as_err.log
