#!/bin/bash
cd /root/repo
while ! grep -q "R2K QUEUE DONE" /root/repo/perf/r2k.jsonl 2>/dev/null; do sleep 60; done
LOG=/root/repo/perf/r2l.jsonl
echo "=== serve bs16 v2 $(date -u +%H:%M:%S) ===" >> $LOG.err
BENCH_KIND=serve BENCH_BATCH=16 BENCH_REPEATS=2 python bench.py >> $LOG 2>> $LOG.err
echo "R2L QUEUE DONE $(date -u +%H:%M:%S)" >> $LOG
