"""Config construction + flattening (≙ Configurable::build_from_path,
border-core/src/base/policy.rs:100-140; config-tree MLflow params,
examples/gym/dqn_cartpole/src/main.rs:122-125)."""

import jax
import numpy as np
import yaml

from border_tpu.agents import DQN, SAC
from border_tpu.train import TrainerConfig
from border_tpu.utils import (
    build_agent,
    build_agent_from_path,
    build_env,
    config_to_dict,
    flatten_config,
    save_config,
)


def test_build_agent_from_yaml(tmp_path):
    path = str(tmp_path / "agent.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(
            {
                "kind": "dqn",
                "config": {
                    "lr": 0.0005,
                    "double_dqn": True,
                    "hidden": [32, 32],
                    "model": "atari_cnn",
                },
            },
            f,
        )
    agent = build_agent_from_path(path)
    assert isinstance(agent, DQN)
    assert agent.config.lr == 0.0005 and agent.config.double_dqn
    assert agent.config.hidden == (32, 32)
    assert callable(agent.config.model)
    # the resolved factory builds the CNN for a given action count
    net = agent.config.model(6)
    obs = jax.numpy.zeros((2, 84, 84, 4), jax.numpy.uint8)
    params = net.init(jax.random.PRNGKey(0), obs)
    assert net.apply(params, obs).shape == (2, 6)


def test_agent_config_yaml_roundtrip(tmp_path):
    agent = build_agent("sac", {"actor_hidden": [16], "critic_hidden": [16]})
    assert isinstance(agent, SAC)
    path = str(tmp_path / "sac.yaml")
    save_config(agent.config, path, kind="sac")
    rebuilt = build_agent_from_path(path)
    assert config_to_dict(rebuilt.config) == config_to_dict(agent.config)


def test_build_agent_rejects_unknown_fields():
    import pytest

    with pytest.raises(ValueError, match="unknown"):
        build_agent("dqn", {"learning_rate": 1e-3})


def test_build_env_from_config():
    from border_tpu.core.env import VecEnv

    env = build_env({"name": "CartPole-v1"})
    assert VecEnv(env, 1).observation_space.shape == (4,)


def test_flatten_config_tree():
    tree = {
        "trainer": TrainerConfig(max_opts=7),
        "agent": {"kind": "dqn", "hidden": (8, 8)},
        "env": "CartPole-v1",
    }
    flat = flatten_config(tree)
    assert flat["trainer.max_opts"] == 7
    assert flat["agent.kind"] == "dqn"
    assert flat["agent.hidden"] == "[8, 8]"
    assert flat["env"] == "CartPole-v1"


def test_compute_cost_records_emitted():
    """record_compute_cost_interval drives average_opt_time /
    average_sample_time records (≙ trainer.rs:163-174,304-310)."""
    from border_tpu.envs import make
    from border_tpu.record import BufferedRecorder
    from border_tpu.replay import ReplayBuffer
    from border_tpu.train import Trainer

    cfg = TrainerConfig(
        max_opts=8, warmup_period=0, opt_interval=16, batch_size=16,
        num_envs=8, steps_per_chunk=8, record_compute_cost_interval=4,
    )
    rec = BufferedRecorder()
    tr = Trainer(make("CartPole-v1"), DQN(), ReplayBuffer(512), cfg, recorder=rec)
    tr.train()
    assert rec.scalars("average_opt_time")
    assert rec.scalars("average_sample_time")
