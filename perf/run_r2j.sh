#!/bin/bash
cd /root/repo
LOG=/root/repo/perf/r2j.jsonl
echo "=== serve bs16 $(date -u +%H:%M:%S) ===" >> $LOG.err
BENCH_KIND=serve BENCH_BATCH=16 BENCH_REPEATS=2 python bench.py >> $LOG 2>> $LOG.err
echo "R2J QUEUE DONE $(date -u +%H:%M:%S)" >> $LOG
