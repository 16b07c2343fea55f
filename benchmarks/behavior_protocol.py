"""Score the fetch-reacher BEHAVIOR policy under the offline gate's own
eval protocol (200 fresh seeded episodes × 5 eval batches, the exact
protocol `learning.py bc_offline/awac_offline` certifies with).

The committed dataset metadata records the behavior policy's DATASET MEAN
(77.81 normalized) — that number includes the collection run's goal-draw
luck.  The apples-to-apples baseline for "does the learned policy beat
the behavior policy" is the same controller scored on the same fresh
seeds; this script measures it (σ=0.6 as collected, σ=0 as the noise-free
ceiling) and writes artifacts/fetch_behavior_protocol.json, which the
offline gate targets cite.

≙ the role of D4RL's reference scores in border-minari/src/evaluator.rs:26-63.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from border_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache(".jax_cache_cpu")

import numpy as np

from make_dataset import ScriptedReacherPolicy  # noqa: E402
from border_tpu.data.datasets import normalized_score  # noqa: E402
from border_tpu.envs import make  # noqa: E402
from border_tpu.train import Evaluator  # noqa: E402

REF_MIN, REF_MAX = -35.676387786865234, -12.451910018920898


def main():
    env = make("Reacher-v0")  # dict obs: the controller reads the goal keys
    out = {}
    for sigma, tag in ((0.6, "behavior_sigma0.6"), (0.0, "controller_sigma0")):
        pol = ScriptedReacherPolicy(sigma=sigma)
        pol.select_action_eval = pol.select_action
        ev = Evaluator(env, n_episodes=200, max_steps=50)
        finals = [
            round(normalized_score(
                ev.evaluate(pol, None, eval_index=10_000 + 7 * i)[0],
                REF_MIN, REF_MAX), 2)
            for i in range(5)
        ]
        out[tag] = {"evals": finals,
                    "median": round(float(np.median(finals)), 2)}
    out["protocol"] = ("Evaluator(n_episodes=200, max_steps=50), "
                      "eval_index 10000+7i, i<5 — identical to the "
                      "bc_offline/awac_offline final certification")
    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "fetch_behavior_protocol.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
