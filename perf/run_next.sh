#!/bin/bash
# Wait for flash4 (marker file), then: bs sweep with the new kernel, then train ablations.
cd /root/repo
while ! grep -q "FLASH4 DONE" /root/repo/perf/flash4_r2.jsonl 2>/dev/null; do sleep 30; done
LOG=/root/repo/perf/bs_r2.jsonl
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" >> $LOG.err
  env "$@" BENCH_REPEATS=2 python bench.py >> $LOG 2>> $LOG.err
}
run BENCH_BATCH=24
run BENCH_BATCH=32 BENCH_DECODE_CHUNK=16
echo "BS SWEEP DONE $(date -u +%H:%M:%S)" >> $LOG
bash /root/repo/perf/run_train_abl.sh
