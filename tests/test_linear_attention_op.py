"""Fused linear-attention block op: Pallas kernel vs XLA reference, gradients,
and module wiring (ldm_tpu/ops/linear_attention.py, models/unet.py LinAttnBlock)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tpu.ops.linear_attention import (
    linear_attention_block,
    linear_attention_block_pallas,
    linear_attention_block_xla,
    linear_attention_block_xla_heads,
)

HEADS, DIM_HEAD = 4, 32
HIDDEN = HEADS * DIM_HEAD


def make_inputs(b=2, n=64, c=16, seed=0):
    ks = jax.random.split(jax.random.key(seed), 8)
    x = jax.random.normal(ks[0], (b, n, c), jnp.float32)
    wqkv = jax.random.normal(ks[1], (c, 3 * HIDDEN), jnp.float32) * 0.1
    wout = jax.random.normal(ks[2], (HIDDEN, c), jnp.float32) * 0.1
    bout = jax.random.normal(ks[3], (c,), jnp.float32) * 0.1
    g1s = 1.0 + 0.1 * jax.random.normal(ks[4], (c,), jnp.float32)
    g1b = 0.1 * jax.random.normal(ks[5], (c,), jnp.float32)
    g2s = 1.0 + 0.1 * jax.random.normal(ks[6], (c,), jnp.float32)
    g2b = 0.1 * jax.random.normal(ks[7], (c,), jnp.float32)
    return x, wqkv, wout, bout, g1s, g1b, g2s, g2b


def test_pallas_interpret_matches_xla():
    args = make_inputs()
    want = linear_attention_block_xla(*args, heads=HEADS, dim_head=DIM_HEAD)
    got = linear_attention_block_pallas(
        *args, heads=HEADS, dim_head=DIM_HEAD, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("b,n,c", [(2, 64, 16), (3, 32, 64), (2, 16, 128)])
def test_xla_heads_matches_xla(b, n, c):
    """The explicit-heads TP form (trainers force it on model-parallel
    meshes, probe27) is the same math as the lane-native form, fwd AND grads."""
    args = make_inputs(b=b, n=n, c=c, seed=5)
    want = linear_attention_block_xla(*args, heads=HEADS, dim_head=DIM_HEAD)
    got = linear_attention_block_xla_heads(*args, heads=HEADS, dim_head=DIM_HEAD)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def loss_lane(a):
        return jnp.sum(
            linear_attention_block_xla(*a, heads=HEADS, dim_head=DIM_HEAD) ** 2
        )

    def loss_heads(a):
        return jnp.sum(
            linear_attention_block_xla_heads(
                *a, heads=HEADS, dim_head=DIM_HEAD) ** 2
        )

    g_lane = jax.grad(loss_lane)(args)
    g_heads = jax.grad(loss_heads)(args)
    for gl, gh in zip(g_lane, g_heads):
        np.testing.assert_allclose(np.asarray(gh), np.asarray(gl),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("g", [1, 2, 4, 8])
def test_pallas_multi_item_blocks_match_xla(g):
    """The G-items-per-program kernel (round 2) is exact for every G, including
    G that splits the batch into several grid programs."""
    args = make_inputs(b=8, n=32, c=16, seed=2)
    want = linear_attention_block_xla(*args, heads=HEADS, dim_head=DIM_HEAD)
    got = linear_attention_block_pallas(
        *args, heads=HEADS, dim_head=DIM_HEAD, interpret=True, block_items=g
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("g", [1, 2, 4])
def test_pallas_packed_c64_matches_xla(g):
    """At C=64 (2C == hidden) the wrapper dispatches the pixel-pair-packed
    kernel — (N/2, 2C) rows, block-diag qkv weights, per-half softmaxes,
    packed output projection (round 2, perf/probe14).  Exact vs XLA for
    every G."""
    args = make_inputs(b=4, n=32, c=64, seed=3)
    want = linear_attention_block_xla(*args, heads=HEADS, dim_head=DIM_HEAD)
    got = linear_attention_block_pallas(
        *args, heads=HEADS, dim_head=DIM_HEAD, interpret=True, block_items=g
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_prefer_pallas_gating(monkeypatch):
    """auto-impl gating: tabled shape + divisible batch + TPU backend + bf16.
    On the CPU test backend it must always be False (the kernel needs Mosaic)."""
    import ldm_tpu.ops.linear_attention as la
    from ldm_tpu.ops.linear_attention import _pick_block_items, prefer_pallas

    assert not prefer_pallas(128, 1024, 64)  # tabled, but backend is cpu here
    assert not prefer_pallas(3, 1024, 64)    # batch not divisible by tabled G
    assert not prefer_pallas(128, 100, 60)   # untabled shape
    assert not prefer_pallas(128, 1024, 64, jnp.float32)  # fp32: VMEM-unsized
    # divisor fallback: decrements to a divisor of the batch, floor 1, and is
    # clamped to the batch first (ADVICE r2: no O(want) scan past tiny batches)
    monkeypatch.setattr(la, "_device_kind", lambda: "TPU v5 lite")
    assert _pick_block_items(64, 1024, 64) == 4
    assert _pick_block_items(6, 1024, 64) == 3
    assert _pick_block_items(1, 1024, 64) == 1
    assert _pick_block_items(2, 7, 3) == 2  # untabled tiny shape: clamp, not scan


def test_prefer_pallas_device_kind_guard(monkeypatch):
    """The G-table is v5e-measured: on an untuned TPU generation `auto` must
    fall back to XLA instead of silently running v5e VMEM-sized blocks
    (VERDICT round 2, weak #6)."""
    import ldm_tpu.ops.linear_attention as la

    monkeypatch.setattr(la.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(la, "_device_kind", lambda: "TPU v5 lite")
    assert la.prefer_pallas(128, 1024, 64)
    # same shapes on other generations: no tuned table -> XLA path
    for kind in ("TPU v4", "TPU v6 lite", "TPU7x", ""):
        monkeypatch.setattr(la, "_device_kind", lambda k=kind: k)
        assert not la.prefer_pallas(128, 1024, 64), kind
    # explicit impl="pallas" still works on untuned kinds via the fallback G
    monkeypatch.setattr(la, "_device_kind", lambda: "TPU v4")
    assert la._pick_block_items(128, 1024, 64) >= 1


@pytest.mark.slow
@pytest.mark.parametrize("n,c,b", [(1024, 64, 4), (256, 128, 16),
                                   # 64px-axis geometries (perf/probe44):
                                   # the big packed site and the deepest
                                   # unpacked one, at tiny batch so the
                                   # interpret run stays cheap
                                   (4096, 64, 1), (64, 512, 2)])
def test_pallas_flagship_shapes_exact_interpret(n, c, b):
    """Per-op exactness at the shapes the auto path actually dispatches on TPU
    (N=1024/C=64 packed, N=256/C=128 unpacked, plus the 64px-axis geometries
    tabled in round 5) at their tabled G, in interpret mode at tight tolerance
    — the whole-UNet wiring test runs at 2e-2 and would miss a sub-2e-2 kernel
    regression at these shapes (ADVICE round 2)."""
    from ldm_tpu.ops.linear_attention import _BLOCK_ITEMS

    g = _BLOCK_ITEMS[(n, c)]
    args = make_inputs(b=b, n=n, c=c, seed=4)
    want = linear_attention_block_xla(*args, heads=HEADS, dim_head=DIM_HEAD)
    got = linear_attention_block_pallas(
        *args, heads=HEADS, dim_head=DIM_HEAD, interpret=True,
        block_items=min(g, b),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pallas_per_item_k_shift_mixed_scales():
    """Regression guard for the per-item k-softmax shift (ADVICE round 2):
    items of different input scales sharing one G-block must each match XLA
    in bf16.  (The pre-GroupNorm bounds cross-item k divergence inside this
    fused block, so the old block-global shift was rarely catastrophic —
    but the per-item shift removes the assumption entirely, and this test
    pins the slice-wise refactor to XLA at mixed scales.)"""
    x, wqkv, wout, bout, g1s, g1b, g2s, g2b = make_inputs(b=2, n=64, c=16, seed=5)
    xs = x.at[1].multiply(30.0).at[1].add(5.0)
    args = (xs, wqkv * 4.0, wout, bout, g1s, g1b, g2s, g2b)
    want = linear_attention_block_xla(
        *args, heads=HEADS, dim_head=DIM_HEAD, compute_dtype=jnp.bfloat16
    )
    got = linear_attention_block_pallas(
        *args, heads=HEADS, dim_head=DIM_HEAD, compute_dtype=jnp.bfloat16,
        interpret=True, block_items=2,
    )
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-2)


def test_block_items_must_divide_batch():
    args = make_inputs(b=6, n=16, c=16)
    with pytest.raises(ValueError):
        linear_attention_block_pallas(
            *args, heads=HEADS, dim_head=DIM_HEAD, interpret=True, block_items=4
        )


def test_pallas_interpret_matches_xla_bf16():
    args = make_inputs(b=1, n=16, c=8, seed=3)
    want = linear_attention_block_xla(
        *args, heads=HEADS, dim_head=DIM_HEAD, compute_dtype=jnp.bfloat16
    )
    got = linear_attention_block_pallas(
        *args, heads=HEADS, dim_head=DIM_HEAD, compute_dtype=jnp.bfloat16,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-2)


def test_custom_vjp_grads_match_xla():
    """The op's gradients (custom VJP through the XLA impl) must equal plain
    jax.grad of the XLA impl."""
    from jax.experimental.pallas import tpu as pltpu

    args = make_inputs(b=1, n=32, c=8, seed=1)

    def loss_op(*a):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(
                linear_attention_block(*a, HEADS, DIM_HEAD, 1e-5, jnp.float32) ** 2
            )

    def loss_xla(*a):
        return jnp.sum(
            linear_attention_block_xla(*a, heads=HEADS, dim_head=DIM_HEAD) ** 2
        )

    g_op = jax.grad(loss_op, argnums=tuple(range(8)))(*args)
    g_xla = jax.grad(loss_xla, argnums=tuple(range(8)))(*args)
    for a, b in zip(g_op, g_xla):
        # grads are O(100); rtol covers the fp32 rounding difference between
        # the kernel forward's cotangent and the XLA forward's
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-4
        )


def test_linattnblock_module_matches_naive_composition():
    """LinAttnBlock(xla) == Residual(PreNorm(LinearAttention)) with identical
    weights (the reference composition, src/UNet.py:14-20,102-110,139-164)."""
    from ldm_tpu.models.unet import LinAttnBlock, LinearAttention, PreNormResidual

    b, hh, ww, c = 2, 8, 8, 16
    x = jax.random.normal(jax.random.key(0), (b, hh, ww, c))
    block = LinAttnBlock(impl="xla")
    params = block.init(jax.random.key(1), x)
    got = block.apply(params, x)

    old = PreNormResidual(LinearAttention())
    p = params["params"]
    old_params = {
        "params": {
            "GroupNorm_0": {"scale": p["norm_pre_scale"], "bias": p["norm_pre_bias"]},
            "fn": {
                "Dense_0": {"kernel": p["qkv_kernel"]},
                "out_kernel": p["out_kernel"],
                "out_bias": p["out_bias"],
                "GroupNorm_0": {
                    "scale": p["norm_post_scale"], "bias": p["norm_post_bias"],
                },
            },
        }
    }
    want = old.apply(old_params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.slow
def test_unet_forward_with_forced_pallas_interpret():
    """The whole UNet runs with the Pallas attention path (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from ldm_tpu.models.unet import UNet

    model = UNet(in_channels=1, out_channels=1, channels=8,
                 channel_multipliers=(1, 2), num_classes=10,
                 attention_impl="pallas")
    x = jnp.zeros((2, 16, 16, 1))
    t = jnp.array([0, 5])
    y = jnp.array([3, 7])
    with pltpu.force_tpu_interpret_mode():
        params = model.init(jax.random.key(0), x, t, y)
        out = model.apply(params, x, t, y)
    xla_model = UNet(in_channels=1, out_channels=1, channels=8,
                     channel_multipliers=(1, 2), num_classes=10,
                     attention_impl="xla")
    want = xla_model.apply(params, x, t, y)
    assert out.shape == x.shape
    # the kernel's reductions are mathematically identical but reordered
    # (slice-wise stats, block-global k shift) — through a whole random-init
    # UNet the GroupNorm rsqrt chain amplifies fp32 rounding to ~7e-3 on
    # outputs of scale ~2 (measured on this toolchain); per-op agreement
    # stays 1e-5 (test_pallas_interpret_matches_xla above), which is the
    # tight correctness check — this test guards the end-to-end wiring
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-2)


@pytest.mark.parametrize("b,n,c,g", [
    (4, 32, 16, 2),    # unpacked
    (2, 64, 32, 1),    # unpacked, single-item blocks
    (4, 32, 64, 2),    # packed (2C == hidden)
    (4, 32, 64, 4),    # packed, one grid program
])
def test_pallas_bwd_matches_xla_vjp(b, n, c, g):
    """The hand-written backward kernels (round 3) must reproduce the XLA
    vjp's gradients for ALL 8 inputs — unpacked and pixel-pair-packed paths,
    including the cross-program weight-grad accumulation (g < b)."""
    from ldm_tpu.ops.linear_attention import linear_attention_block_pallas_bwd

    args = make_inputs(b=b, n=n, c=c, seed=3)
    fn = lambda *a: linear_attention_block_xla(  # noqa: E731
        *a, heads=HEADS, dim_head=DIM_HEAD)
    y, vjp = jax.vjp(fn, *args)
    dy = jax.random.normal(jax.random.key(9), y.shape)
    want = vjp(dy)
    got = linear_attention_block_pallas_bwd(
        args[0], dy, *args[1:], heads=HEADS, dim_head=DIM_HEAD,
        interpret=True, block_items=g,
    )
    for name, a, w in zip(
        ("dx", "dwqkv", "dwout", "dbout", "dg1s", "dg1b", "dg2s", "dg2b"),
        got, want,
    ):
        scale = float(np.max(np.abs(np.asarray(w)))) + 1e-12
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(w), atol=2e-5 * scale, err_msg=name
        )


def test_fused_grads_op_end_to_end():
    """jax.grad through linear_attention_block_fused_grads (pallas fwd +
    pallas bwd, interpret mode) == jax.grad of the XLA impl."""
    from jax.experimental.pallas import tpu as pltpu

    from ldm_tpu.ops.linear_attention import linear_attention_block_fused_grads

    args = make_inputs(b=2, n=32, c=16, seed=6)

    def loss_op(*a):
        return jnp.sum(linear_attention_block_fused_grads(
            *a, HEADS, DIM_HEAD, 1e-5, jnp.float32) ** 2)

    def loss_xla(*a):
        return jnp.sum(linear_attention_block_xla(
            *a, heads=HEADS, dim_head=DIM_HEAD) ** 2)

    # the context must span the whole grad call: the custom-vjp backward (a
    # second pallas_call) is traced after the forward returns
    with pltpu.force_tpu_interpret_mode():
        g_op = jax.grad(loss_op, argnums=tuple(range(8)))(*args)
    g_xla = jax.grad(loss_xla, argnums=tuple(range(8)))(*args)
    for a, b in zip(g_op, g_xla):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-3
        )


@pytest.mark.slow
def test_unet_pallas_grads_impl_trains():
    """A UNet with attention_impl='pallas_grads' produces gradients matching
    the XLA-impl UNet (interpret mode), wiring the fused-VJP op end to end."""
    from jax.experimental.pallas import tpu as pltpu

    from ldm_tpu.models.unet import UNet

    kw = dict(in_channels=1, out_channels=1, channels=8,
              channel_multipliers=(1, 2), num_classes=10)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 1))
    t = jnp.array([0, 5])
    y = jnp.array([3, 7])
    model_p = UNet(attention_impl="pallas_grads", **kw)
    model_x = UNet(attention_impl="xla", **kw)
    with pltpu.force_tpu_interpret_mode():
        params = model_p.init(jax.random.key(1), x, t, y)

        def loss_p(p):
            return jnp.mean(model_p.apply(p, x, t, y) ** 2)

        g_p = jax.grad(loss_p)(params)

    def loss_x(p):
        return jnp.mean(model_x.apply(p, x, t, y) ** 2)

    g_x = jax.grad(loss_x)(params)
    flat_p = jax.tree_util.tree_leaves_with_path(g_p)
    flat_x = jax.tree.leaves(g_x)
    for (path, a), b in zip(flat_p, flat_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4,
            err_msg=str(path),
        )
