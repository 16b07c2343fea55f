"""Test harness configuration.

Runs the whole suite on a virtual 8-device CPU mesh so multi-chip sharding
logic is exercised without a pod — the analogue of the reference's
threads-in-one-process async doctest (border-async-trainer/src/lib.rs:1-137),
as recommended by SURVEY.md §4.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: ambient env may say axon/tpu
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The ambient environment programmatically registers a TPU backend via
# sitecustomize, overriding JAX_PLATFORMS — force CPU after import too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

# This box has few CPU cores, so XLA compiles dominate test wall-time.
# The persistent cache makes re-runs nearly free.  Separate dir from the
# TPU cache — mixing backends poisons AOT entries (machine-feature SIGILLs).
# BORDER_TPU_NO_CPU_CACHE=1 disables it (diagnosing cache-related crashes).
if os.environ.get("BORDER_TPU_NO_CPU_CACHE", "") != "1":
    os.makedirs("/root/repo/.jax_cache_cpu", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


# The XLA:CPU client accumulates live compiled executables across the whole
# pytest process; past ~160 test programs the suite segfaults inside a later
# jit execution (reproduced 4×, bisected: removing ANY ~15-test module before
# the crash point avoids it — the trigger is cumulative, not one test).
# Dropping the jit/pjit executable caches between modules keeps the live-
# executable population bounded; the persistent on-disk cache makes the
# recompiles cheap.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bounded_xla_cpu_state():
    yield
    jax.clear_caches()
