#!/bin/bash
# Session-5 queue: guidance interval (arXiv:2404.07724, opt-in) — CFG only
# at step indices [i0, i1), cond-only HALF-batch UNet outside. Throughput
# depends only on how many steps are skipped (each saves ~half a UNet
# call): 12 skipped → bound ~30/24 = +25%; 15 → +33%. The paper's quality
# argument (guidance harmful at high noise, unnecessary at low) governs
# the PLACEMENT, which costs nothing to vary later.
cd /root/repo
OUT=perf/r3ad_queue.jsonl
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3ad_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3ad_err.log
  if out=$(timeout "$to" env BENCH_REPEATS=5 "$@" python bench.py 2>>/tmp/r3ad_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
run civ_3_24 3600 BENCH_CFG_INTERVAL=3:24
run civ_5_20 3600 BENCH_CFG_INTERVAL=5:20
run civ_0_15 3600 BENCH_CFG_INTERVAL=0:15
# turbo combo: DeepCache-3 x guidance interval (segments carry their own
# caches; each segment seeds with a full pass) — multiplicative expectation
# dc3 (+42%) x civ_5_20 (~+29% bound) ≈ 3.7-3.8 img/s
run civ_5_20_dc3 3600 BENCH_CFG_INTERVAL=5:20 BENCH_DEEPCACHE=3
run civ_3_24_dc5 3600 BENCH_CFG_INTERVAL=3:24 BENCH_DEEPCACHE=5
echo DONE_R3AD >> /tmp/r3ad_err.log
