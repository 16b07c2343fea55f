"""Decompose the fused-Pong learner update cost on the real chip.

Substantiates the MXU-utilization claim with measured per-piece times and
first-principles FLOP counts (VERDICT r2 next #1): prints ms and TFLOP/s
for the CNN forward, forward+backward, the full DQN update (current and
candidate variants), and the in-scan update burst, at batch 512 and 1024.

FLOP accounting (AtariCNN, 84×84×4, per sample):
  conv1 20×20×(8·8·4)×32×2 = 6.55 MF   conv2 9×9×(4·4·32)×64×2 = 5.31 MF
  conv3 7×7×(3·3·64)×64×2  = 4.25 MF   fc1 3136×512×2 = 3.21 MF
  fc2 512×A×2 ≈ 0.01 MF                → fwd ≈ 19.3 MF/sample
  double-DQN update = loss fwd (1×) + bwd (2×) + online fwd on next_obs
  (1×) + target fwd (1×) = 5 fwd-equivalents ≈ 96.7 MF/sample.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

from border_tpu.agents import DQN, DQNConfig
from border_tpu.models import AtariCNN

FWD_MF = 19.33  # MFLOP per sample, forward
A = 6


def timeit(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


RESULTS: dict = {}


def report(name, ms, mflop_per_sample, batch):
    # MFLOP·batch / ms → TFLOP/s: 1e6 FLOP·B / (1e-3 s) / 1e12 = /1e3.
    # NOTE single-dispatch times include ~2.5 ms tunnel dispatch latency —
    # the in-scan rows (update_decomposition.py) are the honest per-op cost
    tf = mflop_per_sample * batch / ms / 1e3  # TFLOP/s
    print(f"{name:<44s} {ms:8.3f} ms   {tf:7.1f} TF/s "
          f"({tf / 197 * 100:4.1f}% of 197 bf16 peak)")
    RESULTS[f"{name} [b{batch}]"] = {
        "ms": round(ms, 3), "tflops": round(tf, 1),
        "pct_peak": round(tf / 197 * 100, 1),
    }


def main():
    RESULTS.clear()
    key = jax.random.PRNGKey(0)
    net = AtariCNN(out_dim=A)
    agent = DQN(DQNConfig(model=lambda n: AtariCNN(out_dim=n), lr=1e-4,
                          double_dqn=True, soft_update_interval=2_000,
                          tau=1.0))
    from border_tpu.core import spaces

    obs_space = spaces.Box(0, 255, (84, 84, 4), jnp.uint8)
    state = agent.init(key, obs_space, spaces.Discrete(A))
    params = state.params

    for B in (512, 1024):
        print(f"--- batch {B} ---")
        obs = jax.random.randint(key, (B, 84, 84, 4), 0, 255, jnp.uint8)
        nobs = jax.random.randint(jax.random.fold_in(key, 1),
                                  (B, 84, 84, 4), 0, 255, jnp.uint8)
        act = jax.random.randint(key, (B,), 0, A, jnp.int32)

        fwd = jax.jit(lambda p, x: net.apply(p, x))
        ms = timeit(fwd, params, obs)
        report("forward", ms, FWD_MF, B)

        def loss_fn(p, x, a):
            q = net.apply(p, x)
            return jnp.mean(jnp.take_along_axis(q, a[:, None], axis=-1))

        grad = jax.jit(jax.grad(loss_fn))
        ms = timeit(grad, params, obs, act)
        report("forward+backward (grad)", ms, 3 * FWD_MF, B)

        # full current update (loss fwd+bwd, online fwd next, target fwd,
        # adam, polyak cond)
        from border_tpu.replay.buffer import TransitionBatch

        batch = TransitionBatch(
            obs=obs, act=act, next_obs=nobs,
            reward=jnp.zeros((B,)), terminated=jnp.zeros((B,), bool),
            truncated=jnp.zeros((B,), bool),
            weight=jnp.ones((B,)), ix_sample=jnp.zeros((B,), jnp.int32),
        )
        # NO donation: timeit reuses the same state across iterations
        # (donating it invalidated the buffer and broke the r4 first run)
        upd = jax.jit(lambda s, b, k: agent.update(s, b, k)[0])
        sc = state
        ms = timeit(lambda s: upd(s, batch, key), sc, iters=30)
        report("agent.update (5 fwd-eq)", ms, 5 * FWD_MF, B)

        # XLA's own model of the update program: flops + memory traffic
        try:
            ca = (jax.jit(lambda s, b, k: agent.update(s, b, k)[0])
                  .lower(sc, batch, key).compile().cost_analysis())
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            RESULTS[f"agent.update cost_analysis [b{B}]"] = {
                k: float(ca[k]) for k in ("flops", "bytes accessed")
                if k in ca
            }
        except Exception as e:  # noqa: BLE001
            RESULTS[f"agent.update cost_analysis [b{B}]"] = repr(e)

        # variant: fused online forward on [obs; next_obs] (one 2B-batch
        # conv stack instead of separate B-batch fwd for the double argmax)
        def upd_fused(s, b, k):
            both = jnp.concatenate([b.obs, b.next_obs], 0)

            def loss(p):
                q_both = net.apply(p, both)
                q = q_both[:B]
                q_next_on = jax.lax.stop_gradient(q_both[B:])
                pred = jnp.take_along_axis(q, b.act[:, None], -1)[:, 0]
                return jnp.mean(pred), q_next_on

            (v, q_next_on), g = jax.value_and_grad(loss, has_aux=True)(
                s.params
            )
            qt = net.apply(s.target_params, b.next_obs)
            a_star = jnp.argmax(q_next_on, -1)
            tgt = jnp.take_along_axis(qt, a_star[:, None], -1)[:, 0]
            import optax

            up, opt_state = agent.tx.update(g, s.opt_state, s.params)
            p2 = optax.apply_updates(s.params, up)
            return s.replace(params=p2, opt_state=opt_state,
                             n_opts=s.n_opts + 1)

        updf = jax.jit(upd_fused)
        ms = timeit(lambda s: updf(s, batch, key), sc, iters=30)
        report("fused-argmax update (~5 fwd-eq)", ms, 5 * FWD_MF, B)

    # in-scan burst at bench shapes (512 updates per chunk, real sampling)
    print("--- bench chunk decomposition (1024 envs, b512) ---")
    from border_tpu.envs import make
    from border_tpu.replay import FrameReplayBuffer
    from border_tpu.train import Trainer, TrainerConfig

    cfg = TrainerConfig(num_envs=1024, steps_per_chunk=32, batch_size=512,
                        opt_interval=64, warmup_period=0, max_opts=10**9)
    buf = FrameReplayBuffer(capacity=256, num_envs=1024)
    tr = Trainer(make("Pong-v0"), agent, buf, cfg)
    agent_state, vec_state, buf_state = tr.init_states(key, key)
    out = tr._chunk(agent_state, vec_state, buf_state, key, True)
    jax.block_until_ready(out)
    agent_state, vec_state, buf_state = out[0], out[1], out[2]

    def chunk(a, v, b, k, du, de):
        return tr._chunk(a, v, b, k, du, de)

    for name, du, de in (("env-only chunk (32 steps)", False, True),
                         ("update-only chunk (512 upd)", True, False),
                         ("full chunk", True, True)):
        def run(k):
            return chunk(agent_state, vec_state, buf_state, k, du, de)

        ms = timeit(run, key, iters=5, warmup=2)
        per_upd = ms / tr.updates_per_chunk
        print(f"{name:<44s} {ms:8.1f} ms"
              + (f"   {1e3 / per_upd:7.1f} updates/s" if du else ""))
        RESULTS[name] = {"ms": round(ms, 1)}
        if du:
            RESULTS[name]["updates_per_sec"] = round(1e3 / per_upd, 1)
    return dict(RESULTS)


if __name__ == "__main__":
    import json

    print(json.dumps({"metric": "profile_update", "results": main()}))
