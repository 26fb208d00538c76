#!/bin/bash
# Session-7 queue 3 (runs after r3ag): the train_vmap8 variant lost when
# r3af_queue.sh was edited after its bash had buffered the file (the
# appended lines never executed — NEVER edit a queue script a waiter may
# have started; append a NEW chained queue instead).
cd /root/repo
OUT=perf/r3ah_queue.jsonl
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3ah_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3ah_err.log
  if out=$(timeout "$to" env "$@" python bench.py 2>>/tmp/r3ah_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
# RTT-cancelled MXU rate probe (v4): probes v1-v3 all carried the ~25 ms
# axon RTT inside a ~43 ms region, deflating every rate 2-4x; v4 times two
# chain lengths and uses the difference so fixed costs cancel exactly.
wait_tpu
echo "=== rate probe v4 ($(date +%H:%M:%S))" >> /tmp/r3ah_err.log
if out=$(timeout 2400 python perf/r3ah_rate_probe.py 2>>/tmp/r3ah_err.log); then
  echo "${out%\}}, \"variant\": \"rate_probe_v4\"}" >> "$OUT"
else
  echo "{\"variant\": \"rate_probe_v4\", \"error\": \"exit $?\"}" >> "$OUT"
fi
# vmap_ids scaling: 4 identities hit 8.02 img/s aggregate (+75% over the
# single-identity bs2 op point); 8 may still fit under remat (4 without
# remat compile-OOMs at 16.08/15.75G).
run train_vmap8 5400 BENCH_KIND=train BENCH_BATCH=2 BENCH_REMAT=1 BENCH_VMAP_IDS=8
echo DONE_R3AH >> /tmp/r3ah_err.log
