"""GSPMD dp×tp: assert the PARTITIONED program, not just placement.

VERDICT r4 weak #3: the dryrun proves the dp×tp chunk trains, but nothing
asserted that XLA's SPMD partitioner actually (a) splits the
column-sharded kernels across the ``model`` axis and (b) inserts the
expected collectives — a silently replicated program would train
identically and waste the mesh.  These tests compile the real fused
chunk on a 4×2 virtual mesh and inspect the post-partitioning HLO.

Mesh device order is ``reshape(dp, tp)`` (gspmd.py:make_dp_tp_mesh), so
- ``model``-axis collectives group adjacent pairs  {0,1},{2,3},{4,5},{6,7}
- ``actors``-axis (gradient psum) groups the strided {0,2,4,6},{1,3,5,7}
"""

import re

import jax
import pytest

from border_tpu.agents import DQN, DQNConfig
from border_tpu.envs import make
from border_tpu.parallel import GSPMDTrainer, make_dp_tp_mesh
from border_tpu.replay import ReplayBuffer
from border_tpu.train import TrainerConfig


@pytest.fixture(scope="module")
def compiled_hlo():
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_dp_tp_mesh(4, 2, devices=jax.devices()[:8])
    cfg = TrainerConfig(num_envs=8, steps_per_chunk=4, batch_size=32,
                        opt_interval=8, warmup_period=0)
    tr = GSPMDTrainer(
        make("CartPole-v1"),
        DQN(DQNConfig(hidden=(32, 32))),
        ReplayBuffer(capacity=256),
        cfg,
        mesh=mesh,
    )
    k = jax.random.PRNGKey(0)
    agent_state, vec_state, buf_state = tr.init_states(k, k)
    compiled = type(tr)._chunk.lower(
        tr, agent_state, vec_state, buf_state, k, True
    ).compile()
    return compiled.as_text()


def _groups(hlo, op):
    """All replica_groups of collectives whose name starts with ``op``."""
    out = []
    for m in re.finditer(
        rf"{op}[^\n]*replica_groups=\{{(\{{[0-9,{{}}\s]*\}})\}}", hlo
    ):
        groups = frozenset(
            frozenset(int(x) for x in g.split(",") if x.strip())
            for g in re.findall(r"\{([0-9,\s]+)\}", m.group(1))
        )
        out.append(groups)
    return out


MODEL_GROUPS = frozenset(
    frozenset(g) for g in ({0, 1}, {2, 3}, {4, 5}, {6, 7})
)
ACTOR_GROUPS = frozenset(
    frozenset(g) for g in ({0, 2, 4, 6}, {1, 3, 5, 7})
)


def test_kernels_are_partitioned_across_model_axis(compiled_hlo):
    """The hidden 32×32 kernels must be computed on in LOCAL column
    shards (32×16 at tp=2): partial dots producing 16-wide outputs that
    are then summed/gathered across shards.  A silently replicated
    program would carry only full 32-wide dots and no 16-wide compute."""
    assert "f32[32,16]" in compiled_hlo
    # partial-sum evidence: an all-reduce (or reduce-scatter) whose
    # operand/result is a LOCAL 16-column tensor
    assert re.search(
        r"(all-reduce|reduce-scatter)[^\n]*f32\[\d+,16\]"
        r"|f32\[\d+,16\][^\n]*(all-reduce|reduce-scatter)",
        compiled_hlo,
    ), "no partial-shard reduction found — kernels look replicated"


def test_model_axis_collectives_present(compiled_hlo):
    """Partitioned Dense matmuls need resharding collectives on their
    weight/activation paths (XLA is free to pick all-gather /
    collective-permute layouts, so assert the *site*: a collective whose
    metadata names a Dense dot_general)."""
    assert re.search(
        r"(all-gather|collective-permute|all-to-all)[^\n]*"
        r"op_name=\"[^\"]*Dense",
        compiled_hlo,
    ), "no collective on any Dense weight/activation path"


def test_gradient_psum_spans_actors_axis(compiled_hlo):
    """Data-parallel gradient reduction must all-reduce across the
    actors axis ({0,2,4,6},{1,3,5,7}) — or jointly across the whole mesh
    (XLA may merge the two reductions into one 8-device group)."""
    seen = _groups(compiled_hlo, "all-reduce")
    whole = frozenset((frozenset(range(8)),))
    assert any(g in (ACTOR_GROUPS, whole) for g in seen), (
        "no gradient all-reduce across the actors axis"
    )
