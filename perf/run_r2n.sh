#!/bin/bash
cd /root/repo
LOG=/root/repo/perf/r2n.jsonl
echo "=== sweep 16 prompts $(date -u +%H:%M:%S) ===" >> $LOG.err
BENCH_KIND=sweep BENCH_SWEEP_PROMPTS=16 BENCH_REPEATS=2 python bench.py >> $LOG 2>> $LOG.err
echo "R2N QUEUE DONE $(date -u +%H:%M:%S)" >> $LOG
