"""Fused UNet ResNet block: Pallas TPU kernel + XLA reference implementation.

The UNet's per-level ResNet block (reference src/UNet.py:61-99) —

    h = GroupNorm8(x); h = silu(h); h = conv3x3(h)          # Block 1
    h = h + Dense(silu(time_emb))[:, None, None, :]          # time injection
    h = GroupNorm8(h); h = silu(h); h = conv3x3(h)          # Block 2
    y = h + (x if C_in == C_out else conv1x1(x))            # shortcut

— is the other half of the sampler's per-level cost next to linear attention.
A round-2 v5e trace of the flagship sampler (perf/probe11.py, 2B=256) showed
the XLA lowering spending 1.45 ms/step in GroupNorm-stats fusions that run
~3x off the HBM roofline, plus 0.9 ms/step of layout copies: XLA lays the
C=64 conv tensors out batch-in-lanes (full 128-lane MXU at 64 channels), but
the Pallas attention custom calls require the default channel-minor layout,
so every 32x32-level block is bracketed by physical transposes.

This kernel keeps the whole block VMEM-resident in the channel-minor layout —
the same layout the adjacent attention kernel uses, so the transposes vanish —
and turns each 3x3 conv into ONE implicit-GEMM matmul:

* patches: for each of the 9 taps, a statically-shifted row-slice of the
  (G*N, C) block, masked by a per-row validity mask (the h/w edge masks double
  as item-boundary masks because each item is exactly S rows of S pixels),
  concatenated along lanes into (G*N, 9C);
* one (G*N, 9C) x (9C, C_out) MXU matmul per conv — K = 9C is deeply tiled;
  C_out = 64 caps output-lane utilization at 50%, the price of the
  channel-minor layout (XLA's batch-in-lanes convs run ~70% but pay for it
  in copies + GN overhead around the attention calls);
* GroupNorm(8) stats per item via lane-wide column sums: one (1, C) colsum of
  x and one of x^2 per item (full-lane VPU reductions), group-aggregated and
  re-expanded with tiny (C, groups) indicator matmuls — no 4D reshapes, no
  strided reductions;
* the time-embedding row add, both SiLUs, bias adds, and the shortcut all stay
  in VMEM.

Numerics: stats + affine in fp32, matmuls in the compute dtype with fp32
accumulation, outputs cast like the flax composition it replaces (tested to
agree; the fp32 configuration matches the torch reference goldens).

Gradients: ``jax.custom_vjp`` recomputing through the XLA implementation —
identical to the linear-attention op's policy (training numerics are
backend-independent, and the Pallas-forward-in-VJP-in-scan compile pathology
documented in docs/perf_round2.md never enters the grad path).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array


def _group_affine_f32(xf, scale_row, bias_row, groups: int, eps: float):
    """GroupNorm(groups) over ONE item's (N, C) fp32 slab -> fp32 normalized.

    Column sums (full-lane VPU reduces) -> per-group stats via a (C, groups)
    indicator matmul -> per-channel affine rows via the transposed expansion.
    """
    n, c = xf.shape
    per = c // groups
    # (C, groups) one-hot group indicator and its (groups, C) expansion,
    # both built from iota (no in-kernel transpose)
    ind = (
        jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // per
        == jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    ).astype(jnp.float32)
    ind_t = (
        jax.lax.broadcasted_iota(jnp.int32, (groups, c), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (groups, c), 1) // per
    ).astype(jnp.float32)
    s1 = jnp.sum(xf, axis=0, keepdims=True)          # (1, C)
    s2 = jnp.sum(xf * xf, axis=0, keepdims=True)     # (1, C)
    cnt = float(n * per)
    mu_g = jnp.dot(s1, ind) / cnt                    # (1, groups)
    m2_g = jnp.dot(s2, ind) / cnt
    var_g = jnp.maximum(m2_g - mu_g * mu_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    mu = jnp.dot(mu_g, ind_t)                        # (1, C) expand
    inv = jnp.dot(inv_g, ind_t)
    a = inv * scale_row
    b = bias_row - mu * inv * scale_row
    return xf * a + b


def _shift_rows(t, s: int):
    """out[r] = t[r + s] with zero fill (static s)."""
    if s == 0:
        return t
    z = jnp.zeros((abs(s), t.shape[1]), t.dtype)
    return (
        jnp.concatenate([t[s:], z], axis=0)
        if s > 0
        else jnp.concatenate([z, t[:s]], axis=0)
    )


def _tap_masks(gn: int, side: int, dtype):
    """Per-row validity masks for the 9 conv taps on a (G*N, C) flattening.

    Row r encodes (item, h, w) = (r // S^2, (r // S) % S, r % S); tap (dy, dx)
    reads row r + dy*S + dx, valid iff h+dy and w+dx stay inside [0, S) — which
    also exactly excludes cross-item reads (each item is S*S consecutive rows).
    """
    r = jax.lax.broadcasted_iota(jnp.int32, (gn, 1), 0)
    h = (r // side) % side
    w = r % side
    masks = {}
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ok_h = (h + dy >= 0) & (h + dy < side)
            ok_w = (w + dx >= 0) & (w + dx < side)
            masks[(dy, dx)] = (ok_h & ok_w).astype(dtype)
    return masks


def _conv3x3_patches(h, side: int, masks):
    """(G*N, C) -> implicit-GEMM patches (G*N, 9C), tap-major lane order
    matching a (3, 3, C_in, C_out) kernel reshaped to (9*C_in, C_out)."""
    pieces = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            piece = _shift_rows(h, dy * side + dx) * masks[(dy, dx)]
            pieces.append(piece)
    return jnp.concatenate(pieces, axis=-1)


def _resnet_kernel(
    x_ref, temb_ref, n1s_ref, n1b_ref, w1_ref, b1_ref, n2s_ref, n2b_ref,
    w2_ref, b2_ref, ws_ref, bs_ref, o_ref,
    *, side: int, groups: int, eps: float, compute_dtype, use_shortcut: bool,
):
    """G batch items per program, one (G, N, C_in) block, channel-minor."""
    cd = compute_dtype
    f32 = jnp.float32
    g, n, cin = x_ref.shape
    gn = g * n
    cout = w1_ref.shape[1]
    x = x_ref[...].reshape(gn, cin)

    n1s = n1s_ref[...].astype(f32)
    n1b = n1b_ref[...].astype(f32)
    n2s = n2s_ref[...].astype(f32)
    n2b = n2b_ref[...].astype(f32)

    # --- Block 1: per-item GroupNorm(8) + SiLU (fp32 stats, cd activations)
    slabs = []
    for gi in range(g):
        sl = x[gi * n : (gi + 1) * n].astype(f32)
        y = _group_affine_f32(sl, n1s, n1b, groups, eps)
        # SiLU in fp32: Mosaic's bf16 logistic trips an internal verifier
        # (f32 scalar broadcast into a bf16 vector)
        slabs.append((y * jax.nn.sigmoid(y)).astype(cd))
    h = jnp.concatenate(slabs, axis=0) if g > 1 else slabs[0]

    # --- conv1 as one implicit-GEMM matmul
    masks = _tap_masks(gn, side, cd)
    patches = _conv3x3_patches(h, side, masks)
    c1 = jnp.dot(
        patches, w1_ref[...].astype(cd), preferred_element_type=f32
    ).astype(cd) + b1_ref[...].astype(cd)

    # --- time-emb row add + Block 2 GroupNorm/SiLU, per item.  temb arrives
    # as the FULL (B, C_out) array (a (G, C_out) block would violate Mosaic's
    # (8, 128) block-divisibility rule for small G) — slice this program's G
    # rows by grid position.
    i = pl.program_id(0)
    temb = temb_ref[pl.ds(i * g, g), :].astype(cd)  # (G, C_out)
    slabs = []
    for gi in range(g):
        sl = (c1[gi * n : (gi + 1) * n] + temb[gi : gi + 1]).astype(f32)
        y = _group_affine_f32(sl, n2s, n2b, groups, eps)
        slabs.append((y * jax.nn.sigmoid(y)).astype(cd))
    h2 = jnp.concatenate(slabs, axis=0) if g > 1 else slabs[0]

    # --- conv2
    patches2 = _conv3x3_patches(h2, side, masks)
    c2 = jnp.dot(
        patches2, w2_ref[...].astype(cd), preferred_element_type=f32
    ) + b2_ref[...].astype(f32)

    # --- shortcut
    if use_shortcut:
        sc = jnp.dot(
            x.astype(cd), ws_ref[...].astype(cd), preferred_element_type=f32
        ) + bs_ref[...].astype(f32)
    else:
        sc = x.astype(f32)
    o_ref[...] = (c2 + sc).astype(o_ref.dtype).reshape(g, n, cout)


# Fastest measured items-per-program on v5e (perf/probe13.py), keyed by
# (N, C_in, C_out).  The patches buffer (G*N, 9*C_in) bf16 is the VMEM
# pacesetter — G is sized to keep it under ~5 MB.
_BLOCK_ITEMS = {
    (1024, 64, 64): 2,     # encoder L0 / final block (32x32)
    (1024, 128, 64): 1,    # decoder last up level (32x32, concat input)
    (256, 64, 128): 4,     # encoder L1 (16x16)
    (256, 192, 64): 2,     # decoder 16x16 level (concat input)
}


def prefer_pallas_resnet(b: int, n: int, cin: int, cout: int, dtype=None) -> bool:
    """True when the fused kernel is the measured winner for this site."""
    g = _BLOCK_ITEMS.get((n, cin, cout))
    return (
        g is not None
        and b % g == 0
        and jax.default_backend() == "tpu"
        and (dtype is None or dtype == jnp.bfloat16)
    )


def resnet_block_xla(
    x, temb, n1s, n1b, w1, b1, n2s, n2b, w2, b2, ws, bs,
    *, groups: int, eps: float = 1e-5, compute_dtype: Any = jnp.float32,
    use_shortcut: bool = False,
) -> Array:
    """Differentiable XLA implementation on NHWC — the same math as the flax
    composition it replaced (fp32 GroupNorm stats/affine like flax
    ``_normalize`` with force_float32_reductions, convs in the compute dtype).

    Args:
      x: (B, H, W, C_in).
      temb: (B, C_out) ALREADY-projected time embedding row (zeros when the
        block is unconditioned); the Dense projection lives in the module.
      n{1,2}s/n{1,2}b: GroupNorm scale/bias, (C_in,) / (C_out,).
      w1/w2: (3, 3, C_in, C_out) / (3, 3, C_out, C_out) HWIO conv kernels.
      b1/b2: (C_out,) conv biases.
      ws/bs: (C_in, C_out) / (C_out,) 1x1 shortcut (ignored unless
        ``use_shortcut``; pass 1-element dummies when identity).
    """
    cd = compute_dtype
    f32 = jnp.float32
    bsz, hh, ww, cin = x.shape
    cout = w1.shape[-1]

    def gn_silu(t, scale, bias, c):
        tf = t.astype(f32).reshape(bsz, hh * ww, groups, c // groups)
        mu = tf.mean(axis=(1, 3), keepdims=True)
        var = jnp.maximum((tf * tf).mean(axis=(1, 3), keepdims=True) - mu * mu, 0.0)
        y = (tf - mu) * jax.lax.rsqrt(var + eps)
        y = y.reshape(bsz, hh, ww, c) * scale.astype(f32) + bias.astype(f32)
        y = y.astype(cd)
        return y * jax.nn.sigmoid(y)

    def conv(t, w, b):
        out = jax.lax.conv_general_dilated(
            t, w.astype(cd), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + b.astype(out.dtype)

    h = conv(gn_silu(x, n1s, n1b, cin), w1, b1)
    h = h + temb.astype(h.dtype)[:, None, None, :]
    h = conv(gn_silu(h, n2s, n2b, cout), w2, b2)
    if use_shortcut:
        sc = (
            jnp.einsum("bhwc,cd->bhwd", x.astype(cd), ws.astype(cd))
            + bs.astype(cd)
        )
    else:
        sc = x
    return (h.astype(f32) + sc.astype(f32)).astype(x.dtype)


def resnet_block_pallas(
    x, temb, n1s, n1b, w1, b1, n2s, n2b, w2, b2, ws, bs,
    *, groups: int, eps: float = 1e-5, compute_dtype: Any = jnp.float32,
    use_shortcut: bool = False, interpret: bool = False,
    block_items: Optional[int] = None,
) -> Array:
    """Fused forward on TPU: grid over the batch, G items per program."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, hh, ww, cin = x.shape
    n = hh * ww
    cout = w1.shape[-1]
    g = block_items or _BLOCK_ITEMS.get(
        (n, cin, cout), max(1, (4 << 20) // max(1, n * 9 * cin * 2))
    )
    while bsz % g:
        g -= 1
    kernel = functools.partial(
        _resnet_kernel, side=hh, groups=groups, eps=eps,
        compute_dtype=compute_dtype, use_shortcut=use_shortcut,
    )
    row = lambda p: p.reshape(1, -1)  # noqa: E731
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    if not use_shortcut:
        # dummies still enter the kernel; keep them tiny but 2D
        ws_in, bs_in = jnp.zeros((1, 1), x.dtype), jnp.zeros((1, 1), x.dtype)
    else:
        ws_in, bs_in = ws, row(bs)
    out = pl.pallas_call(
        kernel,
        grid=(bsz // g,),
        in_specs=[
            pl.BlockSpec((g, n, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full((bsz, cout)),
            full((1, cin)), full((1, cin)),
            full((9 * cin, cout)), full((1, cout)),
            full((1, cout)), full((1, cout)),
            full((9 * cout, cout)), full((1, cout)),
            full(ws_in.shape), full(bs_in.shape),
        ],
        out_specs=pl.BlockSpec(
            (g, n, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, n, cout), x.dtype),
        interpret=interpret,
    )(
        x.reshape(bsz, n, cin), temb,
        row(n1s), row(n1b), w1.reshape(9 * cin, cout), row(b1),
        row(n2s), row(n2b), w2.reshape(9 * cout, cout), row(b2),
        ws_in, bs_in,
    )
    return out.reshape(bsz, hh, ww, cout)


# ------------------------------------------------------- public op (custom VJP)
@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15))
def resnet_block(
    x, temb, n1s, n1b, w1, b1, n2s, n2b, w2, b2, ws, bs,
    groups: int = 8, eps: float = 1e-5, compute_dtype: Any = jnp.float32,
    use_shortcut: bool = False,
):
    """Fused GroupNorm/SiLU/conv3x3 x2 + time injection + shortcut block.

    Forward runs the Pallas TPU kernel; gradients recompute through the XLA
    implementation (identical numerics policy)."""
    return resnet_block_pallas(
        x, temb, n1s, n1b, w1, b1, n2s, n2b, w2, b2, ws, bs,
        groups=groups, eps=eps, compute_dtype=compute_dtype,
        use_shortcut=use_shortcut,
    )


def _fwd(x, temb, n1s, n1b, w1, b1, n2s, n2b, w2, b2, ws, bs,
         groups, eps, compute_dtype, use_shortcut):
    y = resnet_block(
        x, temb, n1s, n1b, w1, b1, n2s, n2b, w2, b2, ws, bs,
        groups, eps, compute_dtype, use_shortcut,
    )
    return y, (x, temb, n1s, n1b, w1, b1, n2s, n2b, w2, b2, ws, bs)


def _bwd(groups, eps, compute_dtype, use_shortcut, residuals, g):
    fn = functools.partial(
        resnet_block_xla,
        groups=groups, eps=eps, compute_dtype=compute_dtype,
        use_shortcut=use_shortcut,
    )
    _, vjp = jax.vjp(fn, *residuals)
    return vjp(g)


resnet_block.defvjp(_fwd, _bwd)
