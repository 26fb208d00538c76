"""Steady-state sweep measurement (VERDICT r2 #1 close-out): the reference
op point is a multi-identity × 3-model sweep (`inference_ID-Booth.py:86-97`),
so BENCH_KIND=sweep now times n_ids identities per pass — run_sweep's
one-deep pipeline hides each batch's host tail (u8 fetch + PNG + eval
dispatch) under the next batch's generation. ids=1 rows reproduce the old
isolated-pass configuration for comparability."""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import bench


def run(tag, **env):
    for k, v in env.items():
        os.environ[k] = str(v)
    try:
        r = bench.bench_sweep(3)
        r["variant"] = tag
        print(json.dumps(r), flush=True)
    except Exception as e:
        print(json.dumps({"variant": tag, "error": f"{type(e).__name__}: {e}"[:400]}),
              flush=True)
    finally:
        for k in env:
            os.environ.pop(k, None)


run("sweep_8_ids1", BENCH_SWEEP_PROMPTS=8, BENCH_SWEEP_IDS=1)
run("sweep_8_ids3", BENCH_SWEEP_PROMPTS=8, BENCH_SWEEP_IDS=3)
run("sweep_16_ids1_bs8", BENCH_SWEEP_PROMPTS=16, BENCH_SWEEP_IDS=1, BENCH_SWEEP_BATCH=8)
run("sweep_16_ids3_bs8", BENCH_SWEEP_PROMPTS=16, BENCH_SWEEP_IDS=3, BENCH_SWEEP_BATCH=8)
run("sweep_8_ids6", BENCH_SWEEP_PROMPTS=8, BENCH_SWEEP_IDS=6)
