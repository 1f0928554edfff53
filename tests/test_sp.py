"""Spatial partitioning (SP, annotation path) tests on the 8-device mesh.

parallel/sp.py shards activation ROWS over the ``model`` axis with
GSPMD-inserted halo exchange in the conv trunk.  The annotation path serves
the SAMPLER (forward-exact; halo exchange is an exact decomposition of the
convolution); its GRADIENTS are corrupted by this jaxlib's partitioned
transpose (perf/probe28_RESULTS.md) — pinned here by a canary — so gradient
programs run the EXPLICIT shard_map path instead (parallel/sp_explicit.py,
tests/test_sp_explicit.py), which makes spatial training work today.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ldm_tpu.parallel.mesh import create_mesh, data_sharding, replicated
from ldm_tpu.parallel.sp import (
    constrain_spatial,
    spatial_sharding,
    wrap_apply_spatial,
)


def _sp_mesh():
    return create_mesh(model=2)  # 8 devices -> (data=4, model=2)


def test_constraint_pins_rows_to_model_axis():
    mesh = _sp_mesh()
    x = jnp.zeros((4, 8, 8, 3))
    y = jax.jit(lambda v: constrain_spatial(mesh, v))(x)
    assert y.sharding.is_equivalent_to(spatial_sharding(mesh), 4)
    # trailing Nones are canonicalized away by jax
    assert y.sharding.spec == P("data", "model")
    # each device holds a (1, 4, 8, 3) row block: B/4 x H/2
    assert y.addressable_shards[0].data.shape == (1, 4, 8, 3)


def test_constraint_noops_on_guard_cases():
    mesh = _sp_mesh()
    # indivisible H (bottleneck guard): 3 rows on a model=2 axis
    x = jnp.zeros((4, 3, 3, 8))
    y = jax.jit(lambda v: constrain_spatial(mesh, v))(x)
    assert not y.sharding.is_equivalent_to(spatial_sharding(mesh), 4)
    # non-4D values pass through untouched
    t = jnp.zeros((4,))
    assert jax.jit(lambda v: constrain_spatial(mesh, v))(t).shape == (4,)
    # mesh-less call is identity
    assert constrain_spatial(None, x) is x


def test_wrap_apply_reconstrains_each_call():
    mesh = _sp_mesh()

    def apply_fn(params, x, t):
        return x * params

    wrapped = wrap_apply_spatial(mesh, apply_fn)
    x = jnp.ones((4, 8, 8, 3))
    out = jax.jit(lambda v: wrapped(2.0, v, None))(x)
    np.testing.assert_allclose(np.asarray(out), 2.0)
    # mesh without a model axis: wrapping is the identity (no closure cost)
    assert wrap_apply_spatial(create_mesh(), apply_fn) is apply_fn


@pytest.mark.slow
def test_sp_sampling_matches_batch_sharded(tmp_path):
    """The SP sampler (rows over model, halo exchange per step) must produce
    the same images as the plain batch-sharded sampler from identical params
    — the forward-exactness contract of perf/probe28 at the API level."""
    from ldm_tpu.config import Config, DataConfig, DiffusionConfig, ModelConfig
    from ldm_tpu.data.datasets import synthetic_dataset
    from ldm_tpu.data.loader import DataLoader
    from ldm_tpu.factory import build_diffusion, build_model
    from ldm_tpu.training.diffusion_trainer import DiffusionTrainer

    def make(workdir, activation_sharding):
        cfg = Config(
            project_name="sp", workdir=workdir, epochs=0, batch_size=16,
            use_amp=False, seed=3, sample_every=0,
            activation_sharding=activation_sharding,
            model=ModelConfig(params=dict(
                in_channels=1, out_channels=1, channels=32,
                channel_multipliers=[1], num_classes=10,
            )),
            diffusion=DiffusionConfig(n_steps=4),
            data=DataConfig(dataset="SYNTHETIC", image_size=8, image_channels=1),
        )
        ds = synthetic_dataset(32, 8, 1, seed=0)
        return DiffusionTrainer(
            cfg, build_model(cfg), build_diffusion(cfg),
            DataLoader(ds, 16, seed=0), DataLoader(ds, 16, seed=1),
            classes=list(range(10)), mesh=_sp_mesh(),
        )

    a = make(str(tmp_path / "batch"), "batch")
    b = make(str(tmp_path / "spatial"), "spatial")
    assert b._spatial and b.model.attention_impl == "xla_heads"
    classes = list(range(8))
    ia = a.sample(classes, cfg_scale=3.0)
    ib = b.sample(classes, cfg_scale=3.0)
    assert ia.shape == ib.shape and ia.dtype == ib.dtype == np.uint8
    # identical params + key; fp32 reduction-order noise can flip a uint8 LSB
    assert np.max(np.abs(ia.astype(np.int32) - ib.astype(np.int32))) <= 1


@pytest.mark.slow
def test_sp_gradient_pathology_canary():
    """Pin the measured GSPMD bug that forced gradient programs onto the
    explicit shard_map path: grads of a conv -> GroupNorm(groups=C) -> conv
    sandwich under the row-sharding ANNOTATION diverge from unsharded grads
    (perf/probe28c).  When a jaxlib upgrade makes this FAIL (grads match),
    the annotation path can serve gradients too — compare it against
    sp_explicit for speed and keep the faster one."""
    mesh = _sp_mesh()

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), padding=1)(x)
            x = nn.GroupNorm(num_groups=8, epsilon=1e-5)(x)
            return nn.Conv(1, (1, 1))(x)

    m = M()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 8, 8, 1)).astype(np.float32)
    tgt = rng.normal(size=(16, 8, 8, 1)).astype(np.float32)
    params = jax.jit(m.init)(jax.random.key(0), x[:1])

    def make(sp):
        def f(p, x, tgt):
            xx = constrain_spatial(mesh, x) if sp else x
            return jnp.mean((m.apply(p, xx) - tgt) ** 2)
        return jax.jit(jax.value_and_grad(f),
                       in_shardings=(replicated(mesh), data_sharding(mesh),
                                     data_sharding(mesh)))

    l0, g0 = make(False)(params, x, tgt)
    l1, g1 = make(True)(params, x, tgt)
    # forward IS exact
    assert abs(float(l0) - float(l1)) < 1e-5
    worst = max(
        np.abs(np.asarray(a) - np.asarray(c)).max() / (np.abs(a).max() + 1e-12)
        for a, c in zip(jax.tree.leaves(g0), jax.tree.leaves(g1))
    )
    assert worst > 1e-2, (
        f"SP annotation-path gradients now match (worst rel {worst:.2e}) — "
        "the jaxlib GSPMD transpose bug is fixed; benchmark the annotation "
        "path against parallel/sp_explicit.py for gradient programs and keep "
        "the faster one."
    )
