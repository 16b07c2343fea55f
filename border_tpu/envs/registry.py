"""Environment registry — string id → Environment factory.

The reference builds envs from YAML config + name strings
(Env::build(config, seed), border-core/src/base/env.rs:81-83; GymEnv name
plumbing border-py-gym-env/src/base.rs:346-473).  Here a flat registry keyed
by the familiar Gymnasium-style ids serves the same role.
"""

from __future__ import annotations

from typing import Callable, Dict

from border_tpu.core.env import Environment

registry: Dict[str, Callable[[], Environment]] = {}


def register(name: str, factory: Callable[[], Environment]) -> None:
    registry[name] = factory


def make(name: str, **kwargs) -> Environment:
    if name not in registry:
        raise KeyError(
            f"Unknown env '{name}'. Registered: {sorted(registry)}"
        )
    return registry[name](**kwargs)


def _register_builtins() -> None:
    from border_tpu.envs import classic_control as cc

    register("CartPole-v1", cc.CartPole)
    register("Pendulum-v1", cc.Pendulum)
    register("MountainCar-v0", cc.MountainCar)
    register("MountainCarContinuous-v0", cc.MountainCarContinuous)
    register("Acrobot-v1", cc.Acrobot)

    from border_tpu.envs.pong import make_pong
    from border_tpu.envs.breakout import make_breakout
    from border_tpu.envs.seaquest import make_seaquest

    from border_tpu.envs.freeway import make_freeway
    from border_tpu.envs.space_invaders import make_space_invaders

    register("Pong-v0", make_pong)
    register("Breakout-v0", make_breakout)
    register("Seaquest-v0", make_seaquest)
    register("Freeway-v0", make_freeway)
    register("SpaceInvaders-v0", make_space_invaders)

    from border_tpu.envs.reacher import FlattenDictWrapper, Reacher

    register("Reacher-v0", Reacher)
    register("ReacherFlat-v0", lambda: FlattenDictWrapper(Reacher()))
    # goal-conditioned flat view: observation ‖ desired_goal, matching
    # GoalDictConverter's key order — the recovered env for dict-obs
    # offline corpora (≙ MinariEnv recovery, border-minari/src/env.rs)
    register(
        "ReacherGoal-v0",
        lambda: FlattenDictWrapper(
            Reacher(), keys=("observation", "desired_goal")
        ),
    )


_register_builtins()
