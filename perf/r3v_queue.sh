#!/bin/bash
# Session-3 TPU queue, part B (after perf/r3u_sampler_options2.sh):
#  - sampler denoise-loop unroll=2 (scan-unrolled; cross-step scheduling)
#  - retries of the two r3t variants that hit the 2400 s timeout
#    (compile of the latency-hiding scheduler variants is slow)
cd /root/repo
OUT=perf/r3v_queue.jsonl
run() {
  tag="$1"; to="$2"; shift 2
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3v_err.log
  if out=$(timeout "$to" env "$@" python bench.py 2>>/tmp/r3v_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
# multi-identity vmapped training at the reference op point (bs2/identity):
# K fine-tunes in one program — the convs see batch 2K, attacking the
# measured 25%-MFU small-batch wall (STATUS.md train roofline). Control =
# serial bs2 at 4.52-4.58; K x 4.52 is the serial-sweep equivalent rate.
# These run FIRST: the expected deltas are large (MFU doubling), so light
# host activity during them cannot flip the verdict — unlike unroll2.
run train_vmap4 3600 BENCH_KIND=train BENCH_BATCH=2 BENCH_REMAT=1 BENCH_VMAP_IDS=4
run train_vmap2 3600 BENCH_KIND=train BENCH_BATCH=2 BENCH_REMAT=1 BENCH_VMAP_IDS=2
run train_vmap4_noremat 3600 BENCH_KIND=train BENCH_BATCH=2 BENCH_VMAP_IDS=4
run train_lhs 3600 BENCH_KIND=train BENCH_BATCH=8 BENCH_REMAT=1 XLA_COMPILER_OPTIONS='{"xla_tpu_enable_latency_hiding_scheduler":"true"}'
run fr_nested 3600 BENCH_KIND=fr XLA_COMPILER_OPTIONS='{"xla_tpu_enable_multi_level_nested_loop_fusion":"true"}'
run fr_membound 3600 BENCH_KIND=fr XLA_COMPILER_OPTIONS='{"xla_tpu_memory_bound_loop_optimizer_options":"enabled:true"}'
# unroll2 LAST: a +-2% sampler default comparison needs a quiet host
run unroll2 3600 BENCH_REPEATS=5 BENCH_UNROLL=2
echo DONE_R3V >> /tmp/r3v_err.log
