"""Round-4 perf-variant audit: the three candidate optimizations measured
end-to-end on the bench Pong chunk (stacked next-forward, b512), one TPU
process.  Baselines from artifacts/update_variants_inscan_steady.json:
separate 862.9 / union 971.3 b512-eq updates/s (no prefetch).

Cells:
- union + prefetch         (sample for i+1 issued inside iteration i:
                            the gather DMA can overlap the MXU compute)
- union + prefetch + kernel-folded /255 (no input-side elementwise pass)
- union + prefetch + Pallas gather (the sweep showed Pallas 1.38x on
                            standalone 7 KB-frame gathers)
Whichever wins becomes the bench default; the trace is re-captured on it.
"""
import gc
import json
import os
import sys
import time

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
    "union_prefetch": dict(sample_mode="union", prefetch=True),
    "union_prefetch_kernelscale": dict(sample_mode="union", prefetch=True,
                                       scale_in_kernel=True),
    "union_prefetch_pallas": dict(sample_mode="union", prefetch=True,
                                  use_pallas=True),
    "separate_prefetch": dict(sample_mode="separate", prefetch=True),
}

def main():
    results = {}
    for name, kw in CELLS.items():
        try:
            r_warm = uv.time_config("stacked", 512, n_chunks=4, **kw)
            r = uv.time_config("stacked", 512, n_chunks=16, **kw)
            r["discarded_first_window"] = r_warm
            results[name] = r
            print(f"[audit4] {name}: {r['b512_equiv_updates_per_sec']} "
                  f"b512-eq/s (compile {r_warm['compile_s']}s)", flush=True)
        except Exception as e:
            results[name] = {"error": repr(e)}
            print(f"[audit4] {name} FAILED: {e!r}", flush=True)
        gc.collect()
    with open(os.path.join(ART, "update_variants_r4_opts.json"), "w") as f:
        json.dump({"metric": "update_variants_r4_opts",
                   "device": str(jax.devices()),
                   "baseline_no_prefetch": {"separate": 862.9, "union": 971.3},
                   "results": results}, f, indent=1)
    print("[audit4] done", flush=True)

if __name__ == "__main__":
    main()
