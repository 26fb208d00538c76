#!/bin/bash
# Session-4 TPU queue, part H (after perf/r3aa_queue.sh): requeue of the
# four r3v variants lost to the second TPU-unavailable window (01:35-03:0x;
# vmap4_noremat/train_lhs burned their slots in backend-init hangs; r3v was
# killed and handed over to the gated chain). vmap4/vmap2 retries already
# live in r3z.
cd /root/repo
OUT=perf/r3ab_queue.jsonl
wait_tpu() {
  for i in $(seq 1 180); do
    if timeout 180 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1; then return 0; fi
    echo "tpu unavailable, probe $i ($(date +%H:%M:%S))" >> /tmp/r3ab_err.log
    sleep 120
  done
}
run() {
  tag="$1"; to="$2"; shift 2
  wait_tpu
  echo "=== $tag ($(date +%H:%M:%S))" >> /tmp/r3ab_err.log
  if out=$(timeout "$to" env "$@" python bench.py 2>>/tmp/r3ab_err.log); then
    echo "${out%\}}, \"variant\": \"$tag\"}" >> "$OUT"
  else
    echo "{\"variant\": \"$tag\", \"error\": \"exit $?\"}" >> "$OUT"
  fi
}
run train_vmap4_noremat 3600 BENCH_KIND=train BENCH_BATCH=2 BENCH_VMAP_IDS=4
run train_lhs 3600 BENCH_KIND=train BENCH_BATCH=8 BENCH_REMAT=1 XLA_COMPILER_OPTIONS='{"xla_tpu_enable_latency_hiding_scheduler":"true"}'
run fr_nested 3600 BENCH_KIND=fr XLA_COMPILER_OPTIONS='{"xla_tpu_enable_multi_level_nested_loop_fusion":"true"}'
run fr_membound 3600 BENCH_KIND=fr XLA_COMPILER_OPTIONS='{"xla_tpu_memory_bound_loop_optimizer_options":"enabled:true"}'
# unroll2 LAST: a +-2% sampler default comparison needs a quiet host
run unroll2 3600 BENCH_REPEATS=5 BENCH_UNROLL=2
echo DONE_R3AB >> /tmp/r3ab_err.log
