"""Round-3 final BASELINE-config measurements in one process (shared
in-process jit cache): sweep 8 / sweep 16 (streaming harness + native PNG),
embed_e2e, serving, FR. One JSON line each."""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import bench


def run(fn, tag, **env):
    for k, v in env.items():
        os.environ[k] = str(v)
    try:
        r = fn()
        r["variant"] = tag
        print(json.dumps(r), flush=True)
    except Exception as e:
        print(json.dumps({"variant": tag, "error": f"{type(e).__name__}: {e}"[:400]}),
              flush=True)
    finally:
        for k in env:
            os.environ.pop(k, None)


run(lambda: bench.bench_sweep(3), "sweep_8", BENCH_SWEEP_PROMPTS=8)
run(lambda: bench.bench_sweep(3), "sweep_16", BENCH_SWEEP_PROMPTS=16)
run(lambda: bench.bench_sweep(3), "sweep_16_bs8", BENCH_SWEEP_PROMPTS=16, BENCH_SWEEP_BATCH=8)
run(lambda: bench.bench_embed_e2e(64, 3), "embed_e2e_bs64")
run(lambda: bench.bench_embed_e2e(256, 3), "embed_e2e_bs256")
run(lambda: bench.bench_serve(16, 30, 3), "serve_bs16")
run(lambda: bench.bench_fr(128, 3), "fr_bs128")
