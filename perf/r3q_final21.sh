#!/bin/bash
# Reference per-identity op point (21 prompts, inference_ID-Booth.py:94)
# on the final retuned kernel; table value 1.90 predates the block retune.
cd /root/repo
OUT=perf/r3l_final.jsonl
echo "=== sweep21_steady ($(date +%H:%M:%S))" >> /tmp/r3l_err.log
if out=$(timeout 2400 env BENCH_KIND=sweep BENCH_SWEEP_PROMPTS=21 python bench.py 2>>/tmp/r3l_err.log); then
  echo "${out%\}}, \"variant\": \"sweep21_steady\"}" >> "$OUT"
else
  echo "{\"variant\": \"sweep21_steady\", \"error\": \"exit $?\"}" >> "$OUT"
fi
echo DONE11 >> /tmp/r3l_err.log
