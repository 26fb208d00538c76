#!/bin/bash
# Session-10 queue 2 (chains after r3av): the int8-attention rate probe,
# FIXED for Mosaic's no-vector<i8>-arithmetic rule (perturb in i32 →
# truncate; the original crashed the remote compiler twice). End-to-end
# verdict already in (r3au: flash_int8 1.888 vs 2.087 exact — negative);
# this probe attributes it: if int8 is ~1× at K=64 QK shapes the approach
# is dead on this MXU; if it is ~2× the loss is kernel overhead.
cd /root/repo
for i in $(seq 1 480); do
  grep -q DONE_R3AV /tmp/r3av_err.log 2>/dev/null && break
  sleep 60
done
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3aw_err.log
    sleep 120
  done
}
wait_tpu
if out=$(timeout 3600 python perf/r3ap_attn_probe.py 2>>/tmp/r3aw_err.log); then
  echo "$out" > perf/r3ap_attn_probe.json
else
  echo "{\"error\": \"attn probe exit $?\"}" > perf/r3ap_attn_probe.json
fi
echo DONE_R3AW >> /tmp/r3aw_err.log
