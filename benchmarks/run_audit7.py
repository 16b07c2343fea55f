"""Update-scan unroll sweep on the r4 final config (union + kernel-fold)."""
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
res = {}
for unroll in (2, 4):
    try:
        w = uv.time_config("stacked", 512, n_chunks=4, sample_mode="union",
                           scale_in_kernel=True, unroll=unroll)
        r = uv.time_config("stacked", 512, n_chunks=16, sample_mode="union",
                           scale_in_kernel=True, unroll=unroll)
        r["discarded_first_window"] = w
        res[f"unroll{unroll}"] = r
        print(f"[audit7] unroll={unroll}: "
              f"{r['b512_equiv_updates_per_sec']} b512-eq/s "
              f"(compile {w['compile_s']}s)", flush=True)
    except Exception as e:
        res[f"unroll{unroll}"] = {"error": repr(e)}
        print(f"[audit7] unroll={unroll} FAILED: {e!r}", flush=True)
    gc.collect()
with open(os.path.join(ART, "update_variants_r4_unroll.json"), "w") as f:
    json.dump({"metric": "update_variants_r4_unroll",
               "baseline_unroll1": 1050.8, "results": res}, f, indent=1)
print("[audit7] done", flush=True)
