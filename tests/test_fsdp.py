"""FSDP (ZeRO-3-style) parameter sharding tests on the 8-device virtual mesh.

The reference has no distributed backend (SURVEY.md §2 parallelism note);
FSDP is capability-plus on top of the DP backbone: parameters / EMA / Adam
moments sharded over the ``data`` axis (parallel/fsdp.py), all-gathered
just-in-time by GSPMD. The contract tested here: identical numbers to plain
DP/single-device, at ~1/N optimizer-state bytes per device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tpu.parallel.fsdp import (
    MIN_SHARD_SIZE,
    fsdp_leaf_sharding,
    fsdp_shardings,
    sharded_bytes_per_device,
    state_shardings,
)
from ldm_tpu.parallel.mesh import create_mesh, replicated


def test_leaf_rule_shards_largest_divisible_dim():
    mesh = create_mesh()  # data=8
    x = jnp.zeros((24, 512))  # both divisible; 512 is larger
    sh = fsdp_leaf_sharding(mesh, x)
    assert sh.spec == jax.sharding.PartitionSpec(None, "data")
    y = jnp.zeros((512, 24))
    assert fsdp_leaf_sharding(mesh, y).spec == jax.sharding.PartitionSpec(
        "data", None
    )


def test_leaf_rule_replicates_small_and_indivisible():
    mesh = create_mesh()
    small = jnp.zeros((64,))  # < MIN_SHARD_SIZE elements
    assert fsdp_leaf_sharding(mesh, small) == replicated(mesh)
    indivisible = jnp.zeros((31, 1031))  # no dim divisible by 8
    assert fsdp_leaf_sharding(mesh, indivisible) == replicated(mesh)
    assert 64 < MIN_SHARD_SIZE  # the bias case the rule exists for


def test_state_shardings_modes():
    from ldm_tpu.training.state import TrainState, make_optimizer

    mesh = create_mesh()
    params = {"w": jnp.zeros((128, 256)), "b": jnp.zeros((256,))}
    state = TrainState.create(params, make_optimizer(1e-3), jax.random.key(0))
    assert state_shardings(mesh, state, "replicated") == replicated(mesh)
    tree = state_shardings(mesh, state, "fsdp")
    assert tree.params["w"].spec == jax.sharding.PartitionSpec(None, "data")
    # PRNG key and step counter stay replicated
    assert tree.key == replicated(mesh)
    assert tree.step == replicated(mesh)
    with pytest.raises(ValueError):
        state_shardings(mesh, state, "bogus")


def _run_trainer(mesh, workdir, param_sharding="replicated",
                 activation_sharding="batch", image_size=8):
    from ldm_tpu.config import Config, DataConfig, DiffusionConfig, ModelConfig
    from ldm_tpu.data.datasets import synthetic_dataset
    from ldm_tpu.data.loader import DataLoader
    from ldm_tpu.factory import build_diffusion, build_model
    from ldm_tpu.training.diffusion_trainer import DiffusionTrainer

    cfg = Config(
        project_name="fsdp", workdir=workdir, epochs=2, batch_size=16,
        use_amp=False, seed=3, sample_every=0,
        param_sharding=param_sharding,
        activation_sharding=activation_sharding,
        # channels=32 so real leaves cross MIN_SHARD_SIZE (3x3x32x32 conv
        # kernels = 9216 elements) — FSDP parity on an all-replicated tree
        # would be vacuous
        model=ModelConfig(params=dict(
            in_channels=1, out_channels=1, channels=32,
            channel_multipliers=[1], num_classes=10,
        )),
        diffusion=DiffusionConfig(n_steps=4),
        data=DataConfig(dataset="SYNTHETIC", image_size=image_size,
                        image_channels=1),
    )
    ds = synthetic_dataset(48, image_size, 1, seed=0)
    tr = DiffusionTrainer(
        cfg, build_model(cfg), build_diffusion(cfg),
        DataLoader(ds, 16, seed=0), DataLoader(ds, 16, seed=1),
        classes=list(range(10)), mesh=mesh,
    )
    hist = tr.train()
    return hist, tr


@pytest.mark.slow
def test_fsdp_training_matches_single_device(tmp_path):
    """FSDP must be numerics-invariant: same loss history as the single-device
    run (the all-gather/reduce-scatter pairs GSPMD inserts are arithmetic-
    equivalent to plain DP's all-reduce), same final params within Adam's
    reduction-order noise (the DP-parity test's calibrated bar)."""
    h1, t1 = _run_trainer(None, str(tmp_path / "single"))
    h2, t2 = _run_trainer(create_mesh(), str(tmp_path / "fsdp"),
                          param_sharding="fsdp")
    np.testing.assert_allclose(h1["train_loss"], h2["train_loss"], rtol=1e-5)
    np.testing.assert_allclose(h1["val_loss"], h2["val_loss"], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


@pytest.mark.slow
def test_fsdp_shards_optimizer_state_and_samples(tmp_path):
    """The memory observable: large param leaves hold ~1/8 of their bytes per
    device, and sampling works straight off the sharded EMA params."""
    _, tr = _run_trainer(create_mesh(), str(tmp_path / "f"),
                         param_sharding="fsdp")
    tree = fsdp_shardings(create_mesh(), tr.state.params)
    sharded_leaves = [
        (leaf, sh) for leaf, sh in zip(jax.tree.leaves(tr.state.params),
                                       jax.tree.leaves(tree))
        if sh != replicated(create_mesh())
    ]
    assert sharded_leaves, "tiny model still has >=1 shardable leaf"
    for leaf, _ in sharded_leaves:
        per_dev = sharded_bytes_per_device([leaf])
        assert per_dev * 8 == leaf.nbytes, (
            f"leaf {leaf.shape} not 8-way sharded: {per_dev} * 8 != {leaf.nbytes}"
        )
    imgs = tr.sample(list(range(8)), cfg_scale=3.0)
    assert imgs.shape[0] == 8 and imgs.dtype == np.uint8

    # Checkpoint roundtrip straight off the sharded state: save gathers to
    # host, load_state re-shards per _state_sh — values bitwise-identical and
    # the restored state drives the jitted eval step unchanged.
    before = [np.asarray(x) for x in jax.tree.leaves(tr.state.params)]
    tr.save_latest()
    tr.state = tr.state.replace(
        params=jax.tree.map(lambda x: x * 0, tr.state.params)
    )
    assert tr.resume_latest()
    after = jax.tree.leaves(tr.state.params)
    assert any(not a.sharding.is_fully_replicated for a in after), (
        "restored params lost their fsdp sharding"
    )
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, np.asarray(b))
