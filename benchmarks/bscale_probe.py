"""Batch-scale ladder rows: union-gather fused chunk at b1024-b4096.

Same 8-samples-per-transition replay ratio as every ladder row
(opt_interval = batch/8); b512-eq updates/s = sampled-frames/s / 512 is
comparable across batch sizes (the r4 ladder's own b1024 row convention).
Larger batches raise MXU efficiency (bigger matmuls, fewer scan
iterations): this measures how far that lever goes on one chip.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from update_variants_r5 import time_config  # noqa: E402

results = {}
for B in (1024, 2048, 4096):
    results[f"union_b{B}"] = time_config(f"union_b{B}", batch_size=B)
results["union_b2048_updonly"] = time_config(
    "union_b2048_updonly", batch_size=2048, update_only=True)
results["union_b4096_updonly"] = time_config(
    "union_b4096_updonly", batch_size=4096, update_only=True)
out = {"metric": "bscale_probe_r5", "results": results}
path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                    "bscale_probe_r5.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
