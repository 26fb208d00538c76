#!/bin/bash
# FR utility-training batch sweep (round-3 roofline follow-up): 1628 img/s
# at the reference op point bs128 is 30% MFU (perf/r3d_fr_roofline.json);
# measure the batch lever like the ID-Booth train roofline did.
cd /root/repo
OUT=perf/r3e_fr_batch.jsonl
for bs in 128 256 512; do
  echo "=== fr bs$bs ($(date +%H:%M:%S))" >> /tmp/r3e_err.log
  if out=$(timeout 2400 env BENCH_KIND=fr BENCH_BATCH=$bs python bench.py 2>>/tmp/r3e_err.log); then
    echo "${out%\}}, \"variant\": \"fr_bs$bs\"}" >> "$OUT"
  else
    echo "{\"variant\": \"fr_bs$bs\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
done
echo DONE >> /tmp/r3e_err.log
