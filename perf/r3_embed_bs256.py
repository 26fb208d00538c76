import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import bench
for bs, tag in ((256, "embed_e2e_bs256_devcascade"),):
    try:
        r = bench.bench_embed_e2e(bs, 3)
        r["variant"] = tag
        print(json.dumps(r), flush=True)
    except Exception as e:
        print(json.dumps({"variant": tag, "error": f"{type(e).__name__}: {e}"[:300]}), flush=True)
# FR re-measure (prior run was contended by the test suite)
try:
    r = bench.bench_fr(128, 3)
    r["variant"] = "fr_bs128_recheck"
    print(json.dumps(r), flush=True)
except Exception as e:
    print(json.dumps({"variant": "fr", "error": str(e)[:300]}), flush=True)
