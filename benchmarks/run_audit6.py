"""Refresh the decomposition under the r4 final defaults (union gather +
kernel-folded /255) and probe b1024 with the full optimization stack."""
import gc, json, os, sys
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
ART = os.path.join(os.path.dirname(__file__), "..", "artifacts")

import update_decomposition
r = update_decomposition.main()
with open(os.path.join(ART, "update_decomposition.json"), "w") as f:
    json.dump({"metric": "update_decomposition",
               "device": str(jax.devices()),
               "note": "r4 final defaults: AtariCNN scale_in_kernel=True "
                       "(kernel-folded /255), union sample_mode",
               "results": r}, f, indent=1)
print("[audit6] decomposition refreshed", flush=True)
gc.collect()

import update_variants_inscan as uv
res = {}
for B in (512, 1024):
    w = uv.time_config("stacked", B, n_chunks=4, sample_mode="union",
                       scale_in_kernel=True)
    r = uv.time_config("stacked", B, n_chunks=16, sample_mode="union",
                       scale_in_kernel=True)
    r["discarded_first_window"] = w
    res[f"union_kernelscale_b{B}"] = r
    print(f"[audit6] union_kernelscale b{B}: "
          f"{r['b512_equiv_updates_per_sec']} b512-eq/s", flush=True)
    gc.collect()
with open(os.path.join(ART, "update_variants_r4_final.json"), "w") as f:
    json.dump({"metric": "update_variants_r4_final", "results": res}, f,
              indent=1)
print("[audit6] done", flush=True)
