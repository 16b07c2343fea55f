"""No-prefetch combos of the two surviving r4 optimizations."""
import gc, json, os, sys
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import update_variants_inscan as uv
ART = os.path.join(os.path.dirname(__file__), "..", "artifacts")
CELLS = {
    "union_kernelscale": dict(sample_mode="union", scale_in_kernel=True),
    "union_kernelscale_pallas": dict(sample_mode="union",
                                     scale_in_kernel=True, use_pallas=True),
    "union_pallas": dict(sample_mode="union", use_pallas=True),
    "separate_kernelscale": dict(sample_mode="separate",
                                 scale_in_kernel=True),
}
results = {}
for name, kw in CELLS.items():
    try:
        r_warm = uv.time_config("stacked", 512, n_chunks=4, **kw)
        r = uv.time_config("stacked", 512, n_chunks=16, **kw)
        r["discarded_first_window"] = r_warm
        results[name] = r
        print(f"[audit5] {name}: {r['b512_equiv_updates_per_sec']} "
              f"b512-eq/s (compile {r_warm['compile_s']}s)", flush=True)
    except Exception as e:
        results[name] = {"error": repr(e)}
        print(f"[audit5] {name} FAILED: {e!r}", flush=True)
    gc.collect()
with open(os.path.join(ART, "update_variants_r4_opts2.json"), "w") as f:
    json.dump({"metric": "update_variants_r4_opts2",
               "baseline": {"union_no_prefetch": 971.3},
               "results": results}, f, indent=1)
print("[audit5] done", flush=True)
