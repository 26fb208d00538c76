"""Round-3 train-step attribution matrix (VERDICT r2 #2a): re-run the bs2 /
bs8 ablations on the CURRENT kernel (flash fwd + fused Pallas backward) in
one process so programs share compiles. One JSON line per variant."""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import bench


def run(tag, **env):
    for k, v in env.items():
        os.environ[k] = str(v)
    try:
        r = bench.bench_train(int(env.get("BENCH_BATCH", 2)), 3)
        r["variant"] = tag
        print(json.dumps(r), flush=True)
    except Exception as e:  # OOM variants must not kill the matrix
        print(json.dumps({"variant": tag, "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)
    finally:
        for k in env:
            os.environ.pop(k, None)


# reference op point, current kernel (baseline for the attribution)
run("bs2_triplet", BENCH_BATCH=2)
# identity branch OFF → branch cost at bs2
run("bs2_mse_only", BENCH_BATCH=2, BENCH_LOSS="")
# identity loss without the triplet negative
run("bs2_identity", BENCH_BATCH=2, BENCH_LOSS="identity")
# remat variants at bs2
run("bs2_triplet_remat_id", BENCH_BATCH=2, BENCH_REMAT_ID=1)
# throughput optimum re-check
run("bs8_remat", BENCH_BATCH=8, BENCH_REMAT=1)
run("bs8_remat_mse_only", BENCH_BATCH=8, BENCH_REMAT=1, BENCH_LOSS="")
