"""Play a trained Pong policy with live terminal rendering / GIF capture.

≙ the reference's eval binaries with the display window enabled
(border-atari-env/src/env/window.rs:1-67 + eval mode in
examples/atari/dqn_atari): loads the committed best DQN checkpoint
(artifacts/pong_model/best, written by examples/dqn_pong.py through
Recorder::save_model) and rolls greedy episodes, drawing frames as ANSI
half-blocks and/or writing an animated GIF.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from border_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # <repo>/.jax_cache, derived from the checkout

import numpy as np

from border_tpu.agents import DQN, DQNConfig
from border_tpu.core.env import VecEnv
from border_tpu.envs import make
from border_tpu.models import AtariCNN
from border_tpu.utils import FrameRecorder, TerminalWindow

DEFAULT_MODEL = os.path.join(
    os.path.dirname(__file__), "..", "artifacts", "pong_model", "best"
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=DEFAULT_MODEL)
    p.add_argument("--steps", type=int, default=3_000)
    p.add_argument("--gif", default="", help="write an animated GIF here")
    p.add_argument("--no-render", action="store_true")
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    env = make("Pong-v0", train=False)
    vec = VecEnv(env, 1)
    agent = DQN(DQNConfig(model=lambda n: AtariCNN(out_dim=n)))
    key = jax.random.PRNGKey(args.seed)
    state = agent.init(key, vec.observation_space, vec.action_space)
    state = agent.load(state, args.model)

    select = jax.jit(agent.select_action_eval)
    window = None if args.no_render else TerminalWindow(fps=args.fps)
    recorder = FrameRecorder() if args.gif else None

    vec_state = vec.reset(key)
    ep_return, ep = 0.0, 0
    for t in range(args.steps):
        key, k = jax.random.split(key)
        action = select(state, vec_state.obs, k)
        ts, vec_state = vec.step(vec_state, action)
        frame = np.asarray(vec_state.obs[0])
        if window is not None:
            window.show(frame)
        if recorder is not None:
            recorder.add(frame)
        ep_return += float(ts.reward[0])
        if bool(ts.done[0]):
            ep += 1
            print(f"episode {ep}: return {ep_return:+.0f}")
            ep_return = 0.0
            if ep >= 1 and recorder is not None:
                break
    if recorder is not None and len(recorder):
        print("gif:", recorder.save_gif(args.gif, fps=args.fps))


if __name__ == "__main__":
    main()
