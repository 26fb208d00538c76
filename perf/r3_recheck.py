import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import bench
for tag, fn in (
    ("fr_bs128_quiet", lambda: bench.bench_fr(128, 5)),
    ("embed_bs4096", lambda: bench.bench_embed(4096, 3)),
):
    try:
        r = fn(); r["variant"] = tag
        print(json.dumps(r), flush=True)
    except Exception as e:
        print(json.dumps({"variant": tag, "error": str(e)[:300]}), flush=True)
