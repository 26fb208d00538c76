"""Round-3 final benches, part B (after the MTCNN device-cascade rewrite):
embed_e2e with the device crops, serving, FR."""
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
        print(json.dumps({"variant": tag, "error": f"{type(e).__name__}: {e}"[:400]}), flush=True)
    finally:
        for k in env:
            os.environ.pop(k, None)

run(lambda: bench.bench_embed_e2e(64, 3), "embed_e2e_bs64_devcascade")
run(lambda: bench.bench_embed_e2e(256, 3), "embed_e2e_bs256_devcascade")
run(lambda: bench.bench_serve(8, 30, 3), "serve_bs8")
run(lambda: bench.bench_fr(128, 3), "fr_bs128")
