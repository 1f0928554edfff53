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

— is HBM-bandwidth-bound: every intermediate is a (B, N, 128) tensor.

ROUND-2 TRACE FINDING (v5e, 2B=128, N=1024, C=64, runs/perf/): the round-1 XLA
formulation spent ~40% of the block in the q-softmax plumbing — the
(B, N, heads, dim_head) fp32 reshape path materialized two tensors 4x the size
of qkv (a 67 MB fp32 softmax output plus a 67 MB broadcast of its denominators)
while the matmuls ran at 43-68% MXU utilization.  The current XLA path
(:func:`linear_attention_block_xla`) therefore restructures the softmaxes to be
lane-layout-native (see its docstring): measured 1.33x faster at the L1 shape
(2B=128) and 1.55-1.58x at 2B=512, lifting the full flagship sampler from 16.8
to 21.3 img/s (T=1000-equivalent, B=64).

The Pallas kernel below implements the same algebra with G batch items per
grid program, the whole block VMEM-resident.  History: the round-1 single-item
kernel lost to XLA ~8% (serialized small dependent matmuls); the round-2
multi-item redesign with slice-wise per-item reductions (see `_fused_kernel`)
beats the XLA path at every flagship level — 1.16-1.22x at the flagship
2B=128 and 1.53-1.79x at 2B=512 (perf/probe6.py, probe7*.json).  UNet's
``attention_impl="auto"`` (the default) picks it on TPU at the measured
shapes; the XLA path serves CPU, fp32, and untabled shapes.

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
    """Optimized XLA implementation, differentiable.

    Same math as the reference composition (softmax_d(q) (softmax_N(k)^T v) with
    per-head blocks, src/UNet.py:139-164), restructured after a v5e trace of the
    first formulation showed the q-softmax plumbing — a (B, N, heads, dim_head)
    fp32 reshape path — costing ~40% of the block (two materialized fp32 tensors
    the size of 4x qkv, runs/perf round 2).  The fixes, all lane-layout-native:

    * q softmax stays in (B, N, heads*dim_head): rowwise max over ALL lanes is a
      per-(b, n) constant, hence a valid shift for every head's softmax; the
      per-head denominators come from ONE (hidden x hidden) block-diagonal ones
      matmul (an MXU segment-sum) instead of a 4D reduce + broadcast;
    * k's softmax normalization commutes out of the context matmul (it is
      constant over N per column), so ctx = (k_e^T v) * recip(k_sum) and the
      normalized k is never materialized;
    * exp/divide run in the compute dtype (bf16 under AMP; fp32 accumulation in
      every matmul) — the f32 path is preserved exactly when compute_dtype is
      fp32 (the torch-parity configuration).

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
    f32 = jnp.float32
    xf32 = x.astype(f32)
    mean = xf32.mean(axis=(1, 2), keepdims=True)
    var = xf32.var(axis=(1, 2), keepdims=True)
    h = ((xf32 - mean) * jax.lax.rsqrt(var + eps) * gn1_scale + gn1_bias).astype(cd)

    qkv = h @ wqkv.astype(cd)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    # --- q: per-head softmax over dim_head, entirely in the 128-lane layout.
    # The shift is the rowwise max over all lanes (constant per row => exact for
    # each head's softmax); segment sums via one block-diag ones matmul (MXU).
    seg = _block_diag_mask(heads, dim_head, cd)
    q_shift = jax.lax.stop_gradient(
        q.astype(f32).max(axis=-1, keepdims=True)
    ).astype(cd)
    q_e = jnp.exp(q - q_shift)
    q_sum = jax.lax.dot_general(
        q_e, seg, (((2,), (0,)), ((), ())), preferred_element_type=f32
    )
    q = (q_e.astype(f32) / q_sum * (dim_head**-0.5)).astype(cd)

    # --- k: softmax over N; the per-(b, d) normalization commutes out of the
    # context contraction, so only exp(k - max) is ever materialized.
    k_shift = jax.lax.stop_gradient(
        k.astype(f32).max(axis=1, keepdims=True)
    ).astype(cd)
    k_e = jnp.exp(k - k_shift)
    k_sum = k_e.astype(f32).sum(axis=1)  # (B, hidden)

    ctx = jnp.einsum("bnd,bne->bde", k_e, v).astype(f32)
    ctx = ctx * (seg.astype(f32) / k_sum[:, :, None])
    ctx_w = jnp.einsum("bde,ec->bdc", ctx.astype(cd), wout.astype(cd))
    out = jnp.einsum("bdc,bnd->bnc", ctx_w, q) + bout.astype(cd)

    of32 = out.astype(f32)
    mean2 = of32.mean(axis=(1, 2), keepdims=True)
    var2 = of32.var(axis=(1, 2), keepdims=True)
    o = (of32 - mean2) * jax.lax.rsqrt(var2 + eps) * gn2_scale + gn2_bias
    return (x.astype(f32) + o).astype(x.dtype)


# ------------------------------------------------------------------------ Pallas
def _fused_kernel(
    x_ref, wqkv_ref, wout_ref, bout_ref, g1s_ref, g1b_ref, g2s_ref, g2b_ref, o_ref,
    *, heads: int, dim_head: int, eps: float, compute_dtype,
):
    """G batch items per program: one (G, N, C) block.

    The round-1 kernel ran one item per program; with every matmul in a single
    item's chain data-dependent on the previous one, the MXU idled between the
    small dependent dots and the kernel lost to XLA (docstring above).  With G
    independent items per block the big matmuls run jointly on the (G*N, .)
    flattening (G-fold larger M) and the per-item contractions are batched dots
    whose G sub-matmuls are mutually independent — the pipeline stays full.

    Mosaic notes (probe5/probe7, v5e):

    * everything is kept rank-2 — 3D elementwise/reduce/broadcast and rank-1
      operands trip `layout.h` checks on this toolchain (the 1-D params arrive
      pre-reshaped to (1, C)); only the two genuinely batched contractions are
      rank-3 dots;
    * per-item reductions (GroupNorm stats, k-softmax denominators) are
      statically-unrolled per-slice VPU reductions + lane-aligned (1, C)
      broadcasts.  The first attempt used item-indicator segment-sum matmuls
      (S: (G, G*N)) — at M=G they drove the MXU at 1/64 utilization and the
      two GroupNorms alone cost HALF the kernel (probe7 stage ablation:
      0.28 ms of 0.57 ms at the L1 shape).
    """
    cd = compute_dtype
    f32 = jnp.float32
    g, n, c = x_ref.shape
    gn = g * n
    hidden = heads * dim_head
    x = x_ref[...].reshape(gn, c)
    xf = x.astype(f32)

    def per_item_affine(t, scale_row, bias_row):
        """GroupNorm(1) over each item's contiguous (N, C) row-slice of t."""
        slabs = []
        for gi in range(g):
            sl = t[gi * n : (gi + 1) * n]
            mu = jnp.sum(sl) / (n * c)  # scalar: full VPU tree-reduce
            var = jnp.sum(sl * sl) / (n * c) - mu * mu
            inv = jax.lax.rsqrt(var + eps)
            a = inv * scale_row  # (1, C)
            b = bias_row - mu * inv * scale_row
            slabs.append(sl * a + b)
        return jnp.concatenate(slabs, axis=0) if g > 1 else slabs[0]

    # --- pre GroupNorm(1): per-item fp32 stats over each (N, C) slab
    h = per_item_affine(xf, g1s_ref[...].astype(f32), g1b_ref[...].astype(f32))
    h = h.astype(cd)

    # --- q/k/v projections: three (G*N, C) x (C, hidden) MXU matmuls (split so
    # the fp32 accumulator buffer is hidden-wide, not 3*hidden — VMEM headroom)
    wqkv = wqkv_ref[...].astype(cd)
    q = jnp.dot(h, wqkv[:, :hidden], preferred_element_type=f32)
    k = jnp.dot(h, wqkv[:, hidden : 2 * hidden], preferred_element_type=f32)
    v = jnp.dot(h, wqkv[:, 2 * hidden :], preferred_element_type=f32).astype(cd)

    # Same algebra as the optimized XLA path: lane-layout-native softmaxes.
    row_h = jax.lax.broadcasted_iota(jnp.int32, (hidden, hidden), 0) // dim_head
    col_h = jax.lax.broadcasted_iota(jnp.int32, (hidden, hidden), 1) // dim_head
    seg = (row_h == col_h).astype(cd)  # block-diag ones

    # --- q: per-head softmax over dim_head; the rowwise max over ALL lanes is
    # constant per row, hence a valid shift for each head; per-head denominators
    # via one (G*N, hidden) x (hidden, hidden) segment-sum matmul (MXU).
    q = q.astype(cd)
    q_shift = q.astype(f32).max(axis=-1, keepdims=True).astype(cd)
    q_e = jnp.exp(q - q_shift)
    q_sum = jnp.dot(q_e, seg, preferred_element_type=f32)
    q = (q_e.astype(f32) / q_sum * (dim_head**-0.5)).astype(cd)

    # --- k: per-item softmax over N.  The shift only needs to be a per-column
    # constant within each item (it cancels against the denominator), so the
    # block-global per-lane max works and keeps the max rank-2; the denominator
    # is a per-slice column sum with a lane-aligned (1, hidden) broadcast —
    # inside VMEM the normalized k costs nothing to materialize (unlike the
    # XLA path).
    k = k.astype(cd)
    k_shift = k.astype(f32).max(axis=0, keepdims=True).astype(cd)  # (1, hidden)
    k_e = jnp.exp(k - k_shift)
    if g > 1:
        k_norm = jnp.concatenate(
            [
                (sl := k_e[gi * n : (gi + 1) * n].astype(f32))
                / jnp.sum(sl, axis=0, keepdims=True)
                for gi in range(g)
            ],
            axis=0,
        ).astype(cd)
    else:
        kf = k_e.astype(f32)
        k_norm = (kf / jnp.sum(kf, axis=0, keepdims=True)).astype(cd)

    # --- context: G independent (hidden x hidden) MXU matmuls (batched dot),
    # masked to per-head blocks
    ctx = jax.lax.dot_general(
        k_norm.reshape(g, n, hidden), v.reshape(g, n, hidden),
        (((1,), (1,)), ((0,), (0,))), preferred_element_type=f32,
    )  # (G, hidden, hidden)
    ctx = (ctx.reshape(g * hidden, hidden)
           * jnp.tile(seg.astype(f32), (g, 1))).astype(cd)

    # --- output: q @ (ctx @ Wout) + bias; ctx@Wout as one (G*hidden, C) matmul
    ctx_w = jnp.dot(
        ctx, wout_ref[...].astype(cd), preferred_element_type=f32
    ).astype(cd)
    out = jax.lax.dot_general(
        q.reshape(g, n, hidden), ctx_w.reshape(g, hidden, c),
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32,
    ).reshape(gn, c)
    out = out + bout_ref[...].astype(f32)

    # --- post GroupNorm(1), per item, + residual
    o = per_item_affine(out, g2s_ref[...].astype(f32), g2b_ref[...].astype(f32))
    o_ref[...] = (xf + o).astype(o_ref.dtype).reshape(g, n, c)


# Fastest measured items-per-program on v5e (perf/probe6.py, probe7*): keyed by
# (N, C) — the fused buffers scale with N*C so the same G works across batch
# sizes (G=8 at N=1024 exceeds VMEM).  Fallback: largest divisor of B that
# keeps the block under ~2 MB of bf16 input.
_BLOCK_ITEMS = {(1024, 64): 4, (256, 128): 16, (64, 256): 32, (16, 512): 32}


def _pick_block_items(b: int, n: int, c: int) -> int:
    want = _BLOCK_ITEMS.get((n, c), max(1, (2 << 20) // max(1, n * c * 2)))
    while b % want:
        want -= 1
    return max(1, want)


def prefer_pallas(b: int, n: int, c: int, dtype=None) -> bool:
    """True when the fused kernel is the measured winner for this shape.

    The kernel beat the XLA path at every flagship (N, C) level once the
    per-item reductions went slice-wise (perf/probe7b/7c.json: 1.16-1.79x),
    but only at the measured G — require the tabled G to divide the batch, a
    real TPU backend (the kernel needs Mosaic; CPU tests interpret-force it),
    and the bf16 compute the table was measured at (fp32 doubles the VMEM
    footprint the G table was sized against).
    """
    g = _BLOCK_ITEMS.get((n, c))
    return (
        g is not None
        and b % g == 0
        and jax.default_backend() == "tpu"
        and (dtype is None or dtype == jnp.bfloat16)
    )


def linear_attention_block_pallas(
    x, wqkv, wout, bout, gn1_scale, gn1_bias, gn2_scale, gn2_bias,
    *, heads: int, dim_head: int, eps: float = 1e-5,
    compute_dtype: Any = jnp.float32, interpret: bool = False,
    block_items: int | None = None,
) -> Array:
    """Fused forward on TPU: grid over the batch, G items (one (G, N, C) block)
    per program — G from the measured table above unless overridden."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x.shape
    g = block_items or _pick_block_items(b, n, c)
    if b % g:
        raise ValueError(f"block_items={g} must divide batch {b}")
    kernel = functools.partial(
        _fused_kernel, heads=heads, dim_head=dim_head, eps=eps,
        compute_dtype=compute_dtype,
    )
    # Rank-1 params go in as (1, C) rows — Mosaic layouts want rank >= 2.
    row = lambda p: p.reshape(1, -1)  # noqa: E731
    full = lambda shape: pl.BlockSpec(  # noqa: E731 — whole-array, VMEM-resident
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full(wqkv.shape), full(wout.shape), full((1, c)),
            full((1, c)), full((1, c)), full((1, c)), full((1, c)),
        ],
        out_specs=pl.BlockSpec(
            (g, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        interpret=interpret,
    )(x, wqkv, wout, row(bout), row(gn1_scale), row(gn1_bias),
      row(gn2_scale), row(gn2_bias))


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
