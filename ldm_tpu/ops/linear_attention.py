"""Fused linear-attention block: Pallas TPU kernel + XLA reference implementation.

The UNet's per-level linear attention (reference src/UNet.py:139-164, wrapped in
Residual(PreNorm(...)) at src/UNet.py:192,230) dominates DDPM sampling time on TPU:
profiled on a v5e chip, the naive composition was ~70% of the per-step UNet cost.
The whole block —

    h   = GroupNorm1(x)                  # PreNorm (src/UNet.py:102-110)
    qkv = h @ Wqkv                       # 1x1 conv == dense over channels
    q   = softmax_per_head_over_d(q) * d^-0.5
    k   = softmax_over_N(k)
    ctx = k^T v   (per head)             # the linear-attention context trick
    o   = q @ (ctx @ Wout) + bout
    o   = GroupNorm2(o)                  # src/UNet.py:164
    y   = x + o                          # Residual (src/UNet.py:14-20)

— looks HBM-bandwidth-bound: every intermediate is a (B, N, 128) tensor.  The
Pallas kernel runs the entire block per batch item in VMEM (a (N, C) tile plus
(N, 384) intermediates fit comfortably at every UNet level: N <= 1024, C <= 512),
reading x once and writing y once.

MEASURED OUTCOME (v5e, B=256, N=1024, C=64, bf16): the kernel runs at 2.08-2.24 ms
vs 1.92 ms for the XLA formulation in models/unet.py (block-diagonal context,
folded out-projection) — XLA's fusion already avoids most intermediate HBM traffic
at these shapes, and the kernel serializes small per-item matmuls on the single
TensorCore (multi-item blocks hit the 16 MB VMEM scoped limit at G>=4).  The UNet
therefore defaults to the XLA path (``UNet.attention_impl = None -> "xla"``); this
kernel stays as the opt-in ``"pallas"`` impl and the template for shapes where
whole-block fusion does win.

Numerics: matmuls in the requested compute dtype (bf16 on TPU) with fp32
accumulation (``preferred_element_type``); norms and softmaxes in fp32 — the same
policy as the XLA path, tested to agree.

Gradients: the op carries a ``jax.custom_vjp`` whose backward recomputes through
the XLA implementation (``jax.vjp``) — sampling (forward-only, the north-star hot
path) gets the fused kernel; training gets identical gradients to the XLA path.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

Array = jax.Array


def _block_diag_mask(heads: int, dim_head: int, dtype) -> Array:
    return jnp.kron(
        jnp.eye(heads, dtype=dtype), jnp.ones((dim_head, dim_head), dtype)
    )


def _groupnorm1(x: Array, scale: Array, bias: Array, eps: float) -> Array:
    """GroupNorm(num_groups=1) over an (N, C) tile, fp32 statistics."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf)
    var = jnp.mean(jnp.square(xf - mean))
    return (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias


# --------------------------------------------------------------------------- XLA
def linear_attention_block_xla(
    x: Array,
    wqkv: Array,
    wout: Array,
    bout: Array,
    gn1_scale: Array,
    gn1_bias: Array,
    gn2_scale: Array,
    gn2_bias: Array,
    *,
    heads: int,
    dim_head: int,
    eps: float = 1e-5,
    compute_dtype: Any = jnp.float32,
) -> Array:
    """Reference implementation (pure XLA), differentiable.

    Args:
      x: (B, N, C) tokens (flattened H*W spatial grid).
      wqkv: (C, 3*heads*dim_head) fused qkv projection (no bias, as the
        reference's ``to_qkv`` 1x1 conv, src/UNet.py:150).
      wout/bout: (heads*dim_head, C) / (C,) output projection.
      gn{1,2}_scale/bias: (C,) GroupNorm affine params (pre-norm / post-norm).
    """
    b, n, c = x.shape
    hidden = heads * dim_head
    cd = compute_dtype
    xf32 = x.astype(jnp.float32)
    mean = xf32.mean(axis=(1, 2), keepdims=True)
    var = xf32.var(axis=(1, 2), keepdims=True)
    h = ((xf32 - mean) * jax.lax.rsqrt(var + eps) * gn1_scale + gn1_bias).astype(cd)

    qkv = h @ wqkv.astype(cd)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = jax.nn.softmax(
        q.reshape(b, n, heads, dim_head).astype(jnp.float32), axis=-1
    )
    q = (q * (dim_head**-0.5)).reshape(b, n, hidden).astype(cd)
    k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(cd)
    ctx = jnp.einsum("bnd,bne->bde", k, v) * _block_diag_mask(heads, dim_head, cd)
    ctx_w = jnp.einsum("bde,ec->bdc", ctx, wout.astype(cd))
    out = jnp.einsum("bdc,bnd->bnc", ctx_w, q) + bout.astype(cd)

    of32 = out.astype(jnp.float32)
    mean2 = of32.mean(axis=(1, 2), keepdims=True)
    var2 = of32.var(axis=(1, 2), keepdims=True)
    o = (of32 - mean2) * jax.lax.rsqrt(var2 + eps) * gn2_scale + gn2_bias
    return (x.astype(jnp.float32) + o).astype(x.dtype)


# ------------------------------------------------------------------------ Pallas
def _fused_kernel(
    x_ref, wqkv_ref, wout_ref, bout_ref, g1s_ref, g1b_ref, g2s_ref, g2b_ref, o_ref,
    *, heads: int, dim_head: int, eps: float, compute_dtype,
):
    cd = compute_dtype
    n, c = x_ref.shape[-2], x_ref.shape[-1]
    hidden = heads * dim_head
    x = x_ref[0]  # (N, C)

    # --- pre GroupNorm(1), fp32 stats over the whole (N, C) tile
    h = _groupnorm1(x, g1s_ref[:], g1b_ref[:], eps).astype(cd)

    # --- qkv projection (MXU), fp32 accumulation
    qkv = jnp.dot(h, wqkv_ref[:].astype(cd), preferred_element_type=jnp.float32)
    q = qkv[:, :hidden]
    k = qkv[:, hidden : 2 * hidden]
    v = qkv[:, 2 * hidden :].astype(cd)

    # --- q: softmax per head over dim_head.  Mosaic can't reshape the lane dim
    # (N, 128) -> (N, 4, 32), so reduce per-head over static lane slices instead
    # (heads is small and static; this unrolls to 4 lane-group reductions).
    q_heads = []
    for i in range(heads):
        qh = q[:, i * dim_head : (i + 1) * dim_head]
        qh = qh - jax.lax.stop_gradient(qh.max(axis=-1, keepdims=True))
        qe = jnp.exp(qh)
        q_heads.append(qe / qe.sum(axis=-1, keepdims=True))
    q = (jnp.concatenate(q_heads, axis=-1) * (dim_head**-0.5)).astype(cd)

    # --- k: softmax over the sequence axis N
    k = k - jax.lax.stop_gradient(k.max(axis=0, keepdims=True))
    ke = jnp.exp(k)
    k = (ke / ke.sum(axis=0, keepdims=True)).astype(cd)

    # --- context: one (hidden x hidden) MXU matmul, masked to per-head blocks
    ctx = jax.lax.dot_general(
        k, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    row_h = jax.lax.broadcasted_iota(jnp.int32, (hidden, hidden), 0) // dim_head
    col_h = jax.lax.broadcasted_iota(jnp.int32, (hidden, hidden), 1) // dim_head
    ctx = jnp.where(row_h == col_h, ctx, 0.0).astype(cd)

    # --- output: q @ (ctx @ Wout) + bias
    ctx_w = jnp.dot(ctx, wout_ref[:].astype(cd), preferred_element_type=jnp.float32)
    out = jnp.dot(q, ctx_w.astype(cd), preferred_element_type=jnp.float32)
    out = out + bout_ref[:].astype(jnp.float32)

    # --- post GroupNorm(1) + residual
    o = _groupnorm1(out, g2s_ref[:], g2b_ref[:], eps)
    o_ref[0] = (x.astype(jnp.float32) + o).astype(o_ref.dtype)


def linear_attention_block_pallas(
    x, wqkv, wout, bout, gn1_scale, gn1_bias, gn2_scale, gn2_bias,
    *, heads: int, dim_head: int, eps: float = 1e-5,
    compute_dtype: Any = jnp.float32, interpret: bool = False,
) -> Array:
    """Fused forward on TPU: grid over the batch; one (N, C) tile per program."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x.shape
    kernel = functools.partial(
        _fused_kernel, heads=heads, dim_head=dim_head, eps=eps,
        compute_dtype=compute_dtype,
    )
    full = lambda shape: pl.BlockSpec(  # noqa: E731 — whole-array, VMEM-resident
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full(wqkv.shape), full(wout.shape), full(bout.shape),
            full(gn1_scale.shape), full(gn1_bias.shape),
            full(gn2_scale.shape), full(gn2_bias.shape),
        ],
        out_specs=pl.BlockSpec(
            (1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        interpret=interpret,
    )(x, wqkv, wout, bout, gn1_scale, gn1_bias, gn2_scale, gn2_bias)


# ------------------------------------------------------- public op (custom VJP)
@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def linear_attention_block(
    x, wqkv, wout, bout, gn1_scale, gn1_bias, gn2_scale, gn2_bias,
    heads: int = 4, dim_head: int = 32, eps: float = 1e-5,
    compute_dtype: Any = jnp.float32,
):
    """Fused PreNorm -> linear attention -> PostNorm -> residual block.

    Forward runs the Pallas TPU kernel; gradients recompute through the XLA
    implementation (identical numerics policy).
    """
    return linear_attention_block_pallas(
        x, wqkv, wout, bout, gn1_scale, gn1_bias, gn2_scale, gn2_bias,
        heads=heads, dim_head=dim_head, eps=eps, compute_dtype=compute_dtype,
    )


def _fwd(x, wqkv, wout, bout, g1s, g1b, g2s, g2b, heads, dim_head, eps, compute_dtype):
    y = linear_attention_block(
        x, wqkv, wout, bout, g1s, g1b, g2s, g2b, heads, dim_head, eps, compute_dtype
    )
    return y, (x, wqkv, wout, bout, g1s, g1b, g2s, g2b)


def _bwd(heads, dim_head, eps, compute_dtype, residuals, g):
    fn = functools.partial(
        linear_attention_block_xla,
        heads=heads, dim_head=dim_head, eps=eps, compute_dtype=compute_dtype,
    )
    _, vjp = jax.vjp(fn, *residuals)
    return vjp(g)


linear_attention_block.defvjp(_fwd, _bwd)
