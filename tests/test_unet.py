"""UNet module tests: shapes, conditioning semantics, dtype policy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tpu.models.unet import UNet, SinusoidalPosEmb


@pytest.fixture(scope="module")
def tiny():
    """One tiny UNet + params shared by every test in this module (1-core CPU:
    compiles are the expensive part, so build once)."""
    model = UNet(
        in_channels=1, out_channels=1, channels=8, channel_multipliers=(1, 2),
        num_classes=10,
    )
    x = jnp.zeros((2, 16, 16, 1))
    t = jnp.array([0, 5])
    y = jnp.array([3, 7])
    params = jax.jit(model.init)(jax.random.key(0), x, t, y)
    return model, params


def test_output_shape_matches_input(tiny):
    model, params = tiny
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 1))
    out = model.apply(params, x, jnp.array([1, 2]), jnp.array([0, 9]))
    assert out.shape == x.shape
    assert out.dtype == jnp.float32


def test_null_label_equals_none(tiny):
    """The reserved null label must reproduce the reference's ``y=None``
    unconditional pass (src/UNet.py:375-376) exactly."""
    model, params = tiny
    x = jax.random.normal(jax.random.key(2), (2, 16, 16, 1))
    t = jnp.array([3, 4])
    o_null = model.apply(params, x, t, jnp.array([10, 10]))
    o_none = model.apply(params, x, t, None)
    np.testing.assert_allclose(np.asarray(o_null), np.asarray(o_none), atol=1e-6)


def test_conditioning_changes_output(tiny):
    model, params = tiny
    x = jax.random.normal(jax.random.key(3), (1, 16, 16, 1))
    t = jnp.array([5])
    a = model.apply(params, x, t, jnp.array([0]))
    b = model.apply(params, x, t, jnp.array([1]))
    c = model.apply(params, x, jnp.array([9]), jnp.array([0]))
    assert not np.allclose(np.asarray(a), np.asarray(b))  # class matters
    assert not np.allclose(np.asarray(a), np.asarray(c))  # time matters


def test_sinusoidal_emb():
    emb = SinusoidalPosEmb(dim=16)
    out = emb.apply({}, jnp.array([0.0, 1.0, 100.0]))
    assert out.shape == (3, 16)
    # t=0: sin part 0, cos part 1
    np.testing.assert_allclose(np.asarray(out[0, :8]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 8:]), 1.0, atol=1e-6)


def test_bf16_compute_fp32_params_and_output():
    model = UNet(
        in_channels=1, out_channels=1, channels=8, channel_multipliers=(1,),
        num_classes=4, dtype=jnp.bfloat16,
    )
    x = jnp.zeros((1, 8, 8, 1))
    params = jax.jit(model.init)(jax.random.key(0), x, jnp.array([0]), jnp.array([0]))
    # params stay fp32 (master weights), output is fp32 for the loss
    leaves = jax.tree.leaves(params)
    assert all(
        leaf.dtype in (jnp.float32, jnp.int32) for leaf in leaves
    ), {leaf.dtype for leaf in leaves}
    out = model.apply(params, x, jnp.array([1]), jnp.array([2]))
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_channel_counts_follow_multipliers(tiny):
    model, params = tiny
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    sizes = {jax.tree_util.keystr(k): v.shape for k, v in flat}
    # encoder level dims 8 -> 8, 8 -> 16 per channel_multipliers (1, 2)
    assert any(v == (8, 16) or v == (16,) for v in sizes.values())


def test_linear_attention_matches_naive_per_head():
    """The MXU-friendly block-diagonal formulation must equal the reference's
    per-head einsum form (src/UNet.py:139-164) with identical weights."""
    from ldm_tpu.models.unet import LinearAttention

    heads, dim_head = 4, 32
    b, hh, ww, c = 2, 8, 8, 16
    mod = LinearAttention(heads=heads, dim_head=dim_head)
    x = jax.random.normal(jax.random.key(0), (b, hh, ww, c))
    params = mod.init(jax.random.key(1), x)
    got = mod.apply(params, x)

    p = params["params"]
    qkv = jnp.einsum("bhwc,cd->bhwd", x, p["Dense_0"]["kernel"])
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split_heads(a):  # (B,H,W,h*d) -> (B,h,N,d), h-major channels
        a = a.reshape(b, hh * ww, heads, dim_head)
        return a.transpose(0, 2, 1, 3)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    q = jax.nn.softmax(q, axis=-1) * dim_head**-0.5
    k = jax.nn.softmax(k, axis=-2)
    context = jnp.einsum("bhnd,bhne->bhde", k, v)
    out = jnp.einsum("bhde,bhnd->bhne", context, q)
    out = out.transpose(0, 2, 1, 3).reshape(b, hh, ww, heads * dim_head)
    out = out @ p["out_kernel"] + p["out_bias"]
    gn = p["GroupNorm_0"]
    mean = out.mean(axis=(1, 2, 3), keepdims=True)
    var = out.var(axis=(1, 2, 3), keepdims=True)
    want = (out - mean) * jax.lax.rsqrt(var + 1e-5) * gn["scale"] + gn["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
