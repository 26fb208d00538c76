#!/bin/bash
# Final round-3 validation on the new defaults (flash 2048/4096 +
# kernel-local vmem): the driver-visible default bench, the steady-state
# sweep, and the serving bench.
cd /root/repo
OUT=perf/r3l_final.jsonl
run() {
  tag="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3l_err.log
  if out=$(timeout 2400 env "$@" python bench.py 2>>/tmp/r3l_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
run default_bench BENCH_REPEATS=5
run sweep8_steady BENCH_KIND=sweep
run sweep16_steady BENCH_KIND=sweep BENCH_SWEEP_PROMPTS=16
run serve BENCH_KIND=serve
echo DONE8 >> /tmp/r3l_err.log
