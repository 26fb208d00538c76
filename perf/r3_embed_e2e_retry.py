import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import bench
try:
    r = bench.bench_embed_e2e(64, 3)
    r["variant"] = "embed_e2e_bs64_devcascade_retry"
    print(json.dumps(r), flush=True)
except Exception as e:
    print(json.dumps({"variant": "retry", "error": f"{type(e).__name__}: {e}"[:500]}), flush=True)
