"""Pipeline-parallel (GPipe-style UNet) tests on the virtual 8-device mesh.

Contract (parallel/pp.py): the 2-stage UNet split is exactly the whole model
(staged == model.apply, same params), the pipelined schedule over a
(data, model=2) mesh reproduces single-device outputs AND gradients, and the
stage weights are genuinely stage-sharded (each device holds one stage row).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ldm_tpu.models.unet import UNet
from ldm_tpu.parallel.mesh import create_mesh
from ldm_tpu.parallel.pp import (
    PPParams, pack_tree, pipeline_unet_apply, pp_pack_params,
    split_unet_params, tree_size, unet_staged_apply, unpack_tree,
)


def _tiny(levels=(1, 2)):
    return UNet(in_channels=1, out_channels=1, channels=8,
                channel_multipliers=list(levels), num_classes=10)


def _init(model, b=8, hw=8):
    k = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (b, hw, hw, 1), jnp.float32)
    t = jax.random.randint(jax.random.key(2), (b,), 0, 100)
    # include null labels (10) to cover the CFG embedding path
    y = (jnp.arange(b, dtype=jnp.int32) * 3) % 11
    params = jax.jit(model.init)(k, x[:1], t[:1], y[:1])
    return params, x, t, y


def test_split_partitions_param_keys():
    model = _tiny()
    params, *_ = _init(model, b=1)
    p0, p1 = split_unet_params(model, params)
    assert set(p0) & set(p1) == set()
    assert set(p0) | set(p1) == set(params["params"])
    # the cut: encoder+bottleneck left, decoder+head right
    assert {"Conv_0", "TimeEmbedding_0", "Embed_0", "Attention_0",
            "ResNetBlock_3"} <= set(p0)
    assert {"Conv_1", "ConvTranspose_0", "ResNetBlock_4",
            "ResNetBlock_6"} <= set(p1)


def test_pack_unpack_roundtrip():
    model = _tiny()
    params, *_ = _init(model, b=1)
    p0, _ = split_unet_params(model, params)
    tpl = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), p0)
    vec = pack_tree(p0)
    assert vec.shape == (tree_size(p0),)
    back = unpack_tree(vec, tpl)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_staged_apply_matches_whole_model():
    """The two stage functions re-express __call__ over the same param
    subtrees — identical math, so outputs agree to fp32 rounding (different
    XLA programs may fuse/reassociate reductions differently)."""
    model = _tiny()
    params, x, t, y = _init(model)
    ref = jax.jit(model.apply)(params, x, t, y)
    staged = jax.jit(lambda p, x, t, y: unet_staged_apply(model, p, x, t, y))(
        params, x, t, y)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(staged),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_pipeline_matches_single_device():
    mesh = create_mesh(model=2)  # (data=4, model=2)
    model = _tiny()
    params, x, t, y = _init(model, b=16)
    pp = pp_pack_params(mesh, model, params)
    # stage rows are genuinely sharded over the model axis
    assert pp.stacked.sharding.spec == P("model")
    assert pp.stacked.addressable_shards[0].data.shape[0] == 1
    ref = jax.jit(model.apply)(params, x, t, y)
    out = jax.jit(
        lambda s, x, t, y: pipeline_unet_apply(
            mesh, PPParams(s, pp.templates, model), x, t, y, n_microbatches=4)
    )(pp.stacked, x, t, y)
    assert out.shape == ref.shape
    # fp32 rounding only: different programs reassociate reductions
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=2e-6)


@pytest.mark.slow
def test_pipeline_grads_match_single_device():
    """jax.grad through the pipelined scan (transposed ppermute schedule)
    must equal single-device gradients, leaf for leaf."""
    mesh = create_mesh(model=2)
    model = _tiny()
    params, x, t, y = _init(model, b=8)
    pp = pp_pack_params(mesh, model, params)
    target = jax.random.normal(jax.random.key(7), x.shape, jnp.float32)

    def ref_loss(p):
        return jnp.mean((model.apply(p, x, t, y) - target) ** 2)

    def pp_loss(stacked):
        out = pipeline_unet_apply(
            mesh, PPParams(stacked, pp.templates, model), x, t, y,
            n_microbatches=2)
        return jnp.mean((out - target) ** 2)

    g_ref = jax.jit(jax.grad(ref_loss))(params)
    g_pp = jax.jit(jax.grad(pp_loss))(pp.stacked)
    g0, g1 = split_unet_params(model, g_ref)
    for k, g_stage in enumerate((g0, g1)):
        got = unpack_tree(g_pp[k], pp.templates[k])
        flat_ref, _ = jax.tree.flatten_with_path(g_stage)
        flat_got = jax.tree.leaves(got)
        for (path, a), b in zip(flat_ref, flat_got):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
                err_msg=f"stage {k} grad mismatch at {path}")
    # padding rows of the stacked grads stay zero (optimizer safety)
    sizes = [tree_size(tpl) for tpl in pp.templates]
    pmax = pp.stacked.shape[1]
    for k, n in enumerate(sizes):
        np.testing.assert_array_equal(np.asarray(g_pp[k, n:]),
                                      np.zeros(pmax - n, np.float32))


@pytest.mark.slow
def test_pp_sampler_matches_single_device():
    """The T-step fused-CFG sampler scan streams through the pipeline via
    make_pp_apply and reproduces single-device samples."""
    from ldm_tpu.diffusion.ddpm import GaussianDiffusion
    from ldm_tpu.parallel.pp import make_pp_apply

    mesh = create_mesh(model=2)
    model = _tiny()
    params, x, t, y = _init(model, b=8)
    diffusion = GaussianDiffusion(n_steps=4)
    pp = pp_pack_params(mesh, model, params)
    classes = jnp.arange(8, dtype=jnp.int32) % 10
    kw = dict(cfg_scale=3.0, null_label=model.num_classes)
    shape = x.shape[1:]
    ref = jax.jit(lambda p, k, c: diffusion.sample(
        model.apply, p, k, c, shape, **kw))(params, jax.random.key(5), classes)
    # fused CFG doubles the batch: 16 = 4 microbatches x (2 data x 2)
    pp_apply = make_pp_apply(mesh, pp, n_microbatches=4)
    out = jax.jit(lambda s, k, c: diffusion.sample(
        pp_apply, s, k, c, shape, **kw))(pp.stacked, jax.random.key(5), classes)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-5)


def test_pipeline_rejects_bad_microbatching():
    mesh = create_mesh(model=2)
    model = _tiny()
    params, x, t, y = _init(model, b=8)
    pp = pp_pack_params(mesh, model, params)
    with pytest.raises(AssertionError):
        pipeline_unet_apply(mesh, pp, x, t, y, n_microbatches=3)
