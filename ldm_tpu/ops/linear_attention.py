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

    # Three matmuls on weight slices rather than one fused matmul + an
    # activation split: numerically identical (each output column is the same
    # independent contraction), but under tensor parallelism the (C, 3H)
    # kernel's column sharding is misaligned with the q/k/v boundaries for
    # power-of-2 model axes, and slicing the WEIGHT makes GSPMD reshard
    # kernel-sized data instead of (B*N)-sized activations (probe27 measured
    # the activation-split variant at 13 all-reduce + 8 all-gather + 10
    # collective-permute per forward vs 5 attention sites).
    w = wqkv.astype(cd)
    q = h @ w[:, :hidden]
    k = h @ w[:, hidden : 2 * hidden]
    v = h @ w[:, 2 * hidden :]

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


def linear_attention_block_xla_heads(
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
    """Per-head formulation for TENSOR-PARALLEL meshes (same math as
    :func:`linear_attention_block_xla`, equivalence-tested).

    The lane-native form above is the single-chip winner, but it encodes the
    head structure in a (hidden, hidden) block-diagonal MASK — opaque to
    GSPMD, which then inserts activation-sized collectives at every site when
    the qkv/out kernels are sharded over the ``model`` axis (probe27: 13
    all-reduce + 8 all-gather + 10 collective-permute on a 5-site forward).
    Here every tensor carries an explicit ``heads`` axis and q/k/v come from
    three kernel-slice matmuls, so the partitioner can keep the whole per-head
    pipeline local to its model-rank and the only large collective left is the
    Megatron-expected all-reduce after the row-sharded output projection.
    Slower single-chip (the 4D fp32 softmax path the lane form was built to
    kill) — trainers select it only when the mesh has a model axis > 1.
    """
    b, n, c = x.shape
    hidden = heads * dim_head
    cd = compute_dtype
    f32 = jnp.float32
    xf32 = x.astype(f32)
    mean = xf32.mean(axis=(1, 2), keepdims=True)
    var = xf32.var(axis=(1, 2), keepdims=True)
    h = ((xf32 - mean) * jax.lax.rsqrt(var + eps) * gn1_scale + gn1_bias).astype(cd)

    w = wqkv.astype(cd)
    q = (h @ w[:, :hidden]).reshape(b, n, heads, dim_head)
    k = (h @ w[:, hidden : 2 * hidden]).reshape(b, n, heads, dim_head)
    v = (h @ w[:, 2 * hidden :]).reshape(b, n, heads, dim_head).astype(cd)

    q = jax.nn.softmax(q.astype(f32), axis=-1).astype(cd) * (dim_head**-0.5)
    k = jax.nn.softmax(k.astype(f32), axis=1).astype(cd)

    ctx = jnp.einsum("bnhd,bnhe->bhde", k, v)  # (B, heads, dh, dh)
    out = jnp.einsum("bhde,bnhd->bnhe", ctx.astype(cd), q)
    out = out.reshape(b, n, hidden) @ wout.astype(cd) + bout.astype(cd)

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
    # constant within each item (it cancels against the denominator) — but it
    # must be PER ITEM, not block-global: with exp in bf16, an item whose k
    # values sit far below another item's max in the same G-block would lose
    # precision / underflow to a zero denominator (ADVICE round 2).  The loop
    # is already slice-wise for the denominator, so the per-item max rides in
    # it for free; everything stays rank-2 with (1, hidden) lane-aligned rows.
    k = k.astype(cd)
    k_slabs = []
    for gi in range(g):
        sl = k[gi * n : (gi + 1) * n]
        sh = sl.astype(f32).max(axis=0, keepdims=True).astype(cd)  # (1, hidden)
        e = jnp.exp(sl - sh).astype(f32)
        k_slabs.append((e / jnp.sum(e, axis=0, keepdims=True)).astype(cd))
    k_norm = jnp.concatenate(k_slabs, axis=0) if g > 1 else k_slabs[0]

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


# ------------------------------------------------- Pallas, pixel-pair packed
def _fused_kernel_packed(
    xp_ref, wqkv2_ref, wout_ref, bout2_ref, g1s2_ref, g1b2_ref, g2s2_ref,
    g2b2_ref, o_ref, *, heads: int, dim_head: int, eps: float, compute_dtype,
):
    """The C=64 variant: two spatial positions packed per 128-lane row.

    probe13b's noop ablation exposed a 2x tax on every channel-minor (., 64)
    bf16 array: the (8, 128) tile pads the 64-wide lane dim to 128, doubling
    HBM DMA bytes and VMEM footprint.  At C=64 (the two 32x32 UNet levels +
    the untabled 16x16 decoder site) this kernel therefore takes x reshaped
    to (G, N/2, 2C) — pixel pair [2m, 2m+1] per row — so the I/O and every
    C-space buffer is exactly 128 lanes wide:

    * GroupNorms (num_groups=1: stats over the whole item) read the packed
      slab directly; affine rows arrive pre-tiled to (1, 2C);
    * the qkv projection uses the block-diagonal (2C, 6H) weight
      diag(Wqkv, Wqkv) built by the wrapper — each output row is
      [pix0 qkv (3H) | pix1 qkv (3H)], so q/k/v halves slice out at
      128-aligned offsets;
    * softmax chains run per half (identical math per pixel row); the
      k-softmax shift is the elementwise max of the two halves' per-lane
      maxes — the same block-global constant as the unpacked kernel;
    * the context sums over all N, so ctx = k0n^T v0 + k1n^T v1 needs no
      interleave;
    * the output projection stays packed via a per-item block-diagonal
      (2H, 2C) = diag(ctx_w, ctx_w), assembled with two lane-aligned selector
      matmuls + a row concat (no 64-lane-offset concats anywhere).

    Algebraically identical to `_fused_kernel`; only the layout differs.
    """
    cd = compute_dtype
    f32 = jnp.float32
    g, np_, c2 = xp_ref.shape          # np_ = N/2 packed rows, c2 = 2C = 128
    gnp = g * np_
    hidden = heads * dim_head          # == c2 for the C=64 sites
    c = c2 // 2
    xp = xp_ref[...].reshape(gnp, c2)
    xf = xp.astype(f32)

    def per_item_affine(t, scale_row, bias_row):
        slabs = []
        for gi in range(g):
            sl = t[gi * np_ : (gi + 1) * np_]
            mu = jnp.sum(sl) / (np_ * c2)
            var = jnp.sum(sl * sl) / (np_ * c2) - mu * mu
            inv = jax.lax.rsqrt(var + eps)
            a = inv * scale_row
            b = bias_row - mu * inv * scale_row
            slabs.append(sl * a + b)
        return jnp.concatenate(slabs, axis=0) if g > 1 else slabs[0]

    h = per_item_affine(xf, g1s2_ref[...].astype(f32), g1b2_ref[...].astype(f32))
    h = h.astype(cd)

    w2 = wqkv2_ref[...].astype(cd)     # (2C, 6H) block-diag
    q0 = jnp.dot(h, w2[:, :hidden], preferred_element_type=f32)
    k0 = jnp.dot(h, w2[:, hidden : 2 * hidden], preferred_element_type=f32)
    v0 = jnp.dot(h, w2[:, 2 * hidden : 3 * hidden],
                 preferred_element_type=f32).astype(cd)
    q1 = jnp.dot(h, w2[:, 3 * hidden : 4 * hidden], preferred_element_type=f32)
    k1 = jnp.dot(h, w2[:, 4 * hidden : 5 * hidden], preferred_element_type=f32)
    v1 = jnp.dot(h, w2[:, 5 * hidden :],
                 preferred_element_type=f32).astype(cd)

    row_h = jax.lax.broadcasted_iota(jnp.int32, (hidden, hidden), 0) // dim_head
    col_h = jax.lax.broadcasted_iota(jnp.int32, (hidden, hidden), 1) // dim_head
    seg = (row_h == col_h).astype(cd)

    def q_softmax(qh):
        qh = qh.astype(cd)
        shift = qh.astype(f32).max(axis=-1, keepdims=True).astype(cd)
        q_e = jnp.exp(qh - shift)
        q_sum = jnp.dot(q_e, seg, preferred_element_type=f32)
        return (q_e.astype(f32) / q_sum * (dim_head**-0.5)).astype(cd)

    q0n, q1n = q_softmax(q0), q_softmax(q1)

    # k softmax over N, per item, across both halves.  The shift must be the
    # same constant for both pixel halves of one item (they share a
    # denominator) but PER ITEM across the G-block — a block-global max loses
    # bf16 exp precision for small-scale items (ADVICE round 2), so the
    # per-item max of both halves rides inside the existing slice loop.
    k0 = k0.astype(cd)
    k1 = k1.astype(cd)
    k0n_slabs, k1n_slabs = [], []
    for gi in range(g):
        s0c = k0[gi * np_ : (gi + 1) * np_]
        s1c = k1[gi * np_ : (gi + 1) * np_]
        ksh = jnp.maximum(
            s0c.astype(f32).max(axis=0, keepdims=True),
            s1c.astype(f32).max(axis=0, keepdims=True),
        ).astype(cd)  # (1, hidden)
        s0 = jnp.exp(s0c - ksh).astype(f32)
        s1 = jnp.exp(s1c - ksh).astype(f32)
        denom = jnp.sum(s0, axis=0, keepdims=True) + jnp.sum(
            s1, axis=0, keepdims=True
        )
        k0n_slabs.append((s0 / denom).astype(cd))
        k1n_slabs.append((s1 / denom).astype(cd))
    k0n = jnp.concatenate(k0n_slabs, axis=0) if g > 1 else k0n_slabs[0]
    k1n = jnp.concatenate(k1n_slabs, axis=0) if g > 1 else k1n_slabs[0]

    ctx = jax.lax.dot_general(
        k0n.reshape(g, np_, hidden), v0.reshape(g, np_, hidden),
        (((1,), (1,)), ((0,), (0,))), preferred_element_type=f32,
    ) + jax.lax.dot_general(
        k1n.reshape(g, np_, hidden), v1.reshape(g, np_, hidden),
        (((1,), (1,)), ((0,), (0,))), preferred_element_type=f32,
    )  # (G, hidden, hidden)
    ctx = (ctx.reshape(g * hidden, hidden)
           * jnp.tile(seg.astype(f32), (g, 1))).astype(cd)

    ctx_w = jnp.dot(
        ctx, wout_ref[...].astype(cd), preferred_element_type=f32
    ).astype(cd)  # (G*hidden, C)

    # lane-aligned selectors: [I_C | 0] and [0 | I_C], both (C, 2C)
    sel_i = jax.lax.broadcasted_iota(jnp.int32, (c, c2), 0)
    sel_j = jax.lax.broadcasted_iota(jnp.int32, (c, c2), 1)
    sel0 = (sel_i == sel_j).astype(cd)
    sel1 = (sel_i == sel_j - c).astype(cd)
    cw0 = jnp.dot(ctx_w, sel0, preferred_element_type=f32).astype(cd)
    cw1 = jnp.dot(ctx_w, sel1, preferred_element_type=f32).astype(cd)

    qp = jnp.concatenate([q0n, q1n], axis=1)  # (G*np, 2H), 128-aligned
    out_slabs = []
    for gi in range(g):
        ctxw2 = jnp.concatenate(
            [cw0[gi * hidden : (gi + 1) * hidden],
             cw1[gi * hidden : (gi + 1) * hidden]], axis=0
        )  # (2H, 2C) = diag(ctx_w_i, ctx_w_i)
        out_slabs.append(
            jnp.dot(qp[gi * np_ : (gi + 1) * np_], ctxw2,
                    preferred_element_type=f32)
        )
    out = jnp.concatenate(out_slabs, axis=0) if g > 1 else out_slabs[0]
    out = out + bout2_ref[...].astype(f32)

    o = per_item_affine(out, g2s2_ref[...].astype(f32), g2b2_ref[...].astype(f32))
    o_ref[...] = (xf + o).astype(o_ref.dtype).reshape(g, np_, c2)


# ------------------------------------------------------------- Pallas backward
def _fused_kernel_bwd(
    x_ref, dy_ref, wqkv_ref, wout_ref, bout_ref, g1s_ref, g1b_ref, g2s_ref,
    g2b_ref,
    dx_ref, dwqkv_ref, dwout_ref, dbout_ref, dg1s_ref, dg1b_ref, dg2s_ref,
    dg2b_ref,
    *, heads: int, dim_head: int, eps: float, compute_dtype,
):
    """Hand-derived VJP of the fused block (round 3, VERDICT item 3).

    The op's round-2 gradient path recomputed the whole block through the XLA
    implementation (``jax.vjp`` in ``_bwd``), which (a) re-pays the forward
    and (b) keeps the XLA attention formulation — with its layout copies and
    GroupNorm-stats fusions — in every gradient program (docs/perf_round2.md
    §10: those two groups are 39% of the train step).  This kernel computes
    the exact same gradients in one pass: forward intermediates are
    recomputed in VMEM (flash-attention style — HBM reads are just x, dy and
    the weights), then the chain runs backward with every contraction
    MXU-shaped and every per-item reduction slice-wise, mirroring the
    forward's layout rules.

    Weight/affine gradients accumulate ACROSS grid programs into f32 output
    refs (same-block out_specs; initialized at program 0 — the TPU grid is
    sequential so read-modify-write is race-free).

    Derivation sketch (per item; μ/σ over the whole (N, C) slab, num_groups=1;
    softmax shifts are constants under the vjp — they cancel exactly):

        GN:    dÂ = dH⊙g;  dA = (dÂ - mean(dÂ) - Â⊙mean(dÂ⊙Â)) / σ
        q-sm:  dq = qn ⊙ (dqn - ((qn⊙dqn)@seg) / s),   s = dim_head^-0.5
        k-sm:  dk = kn ⊙ (dkn - colsum_item(kn⊙dkn))
        ctx:   dkn = v@dctxᵀ, dv = kn@dctx, dctx = (dcw@Woutᵀ)⊙seg
        out:   dqn = do@cwᵀ, dcw = qnᵀ@do, dWout += Σ ctxᵀ@dcw
    """
    cd = compute_dtype
    f32 = jnp.float32
    g, n, c = x_ref.shape
    gn = g * n
    hidden = heads * dim_head
    scale = dim_head ** -0.5
    x = x_ref[...].reshape(gn, c)
    dy = dy_ref[...].reshape(gn, c).astype(f32)
    xf = x.astype(f32)

    row_h = jax.lax.broadcasted_iota(jnp.int32, (hidden, hidden), 0) // dim_head
    col_h = jax.lax.broadcasted_iota(jnp.int32, (hidden, hidden), 1) // dim_head
    seg = (row_h == col_h).astype(cd)
    segf = seg.astype(f32)

    # ---------- forward recompute (identical math/dtypes to _fused_kernel) ---
    g1s = g1s_ref[...].astype(f32)
    g1b = g1b_ref[...].astype(f32)
    xhat_slabs, inv1 = [], []
    for gi in range(g):
        sl = xf[gi * n : (gi + 1) * n]
        mu = jnp.sum(sl) / (n * c)
        var = jnp.sum(sl * sl) / (n * c) - mu * mu
        iv = jax.lax.rsqrt(var + eps)
        inv1.append(iv)
        xhat_slabs.append((sl - mu) * iv)
    xhat = jnp.concatenate(xhat_slabs, axis=0) if g > 1 else xhat_slabs[0]
    h = (xhat * g1s + g1b).astype(cd)

    wqkv = wqkv_ref[...].astype(cd)
    wq, wk, wv = (wqkv[:, :hidden], wqkv[:, hidden : 2 * hidden],
                  wqkv[:, 2 * hidden :])
    q = jnp.dot(h, wq, preferred_element_type=f32).astype(cd)
    k = jnp.dot(h, wk, preferred_element_type=f32).astype(cd)
    v = jnp.dot(h, wv, preferred_element_type=f32).astype(cd)

    q_shift = q.astype(f32).max(axis=-1, keepdims=True).astype(cd)
    q_e = jnp.exp(q - q_shift)
    q_sum = jnp.dot(q_e, seg, preferred_element_type=f32)
    qn = (q_e.astype(f32) / q_sum * scale).astype(cd)

    kn_slabs = []
    for gi in range(g):
        sl = k[gi * n : (gi + 1) * n]
        sh = sl.astype(f32).max(axis=0, keepdims=True).astype(cd)
        e = jnp.exp(sl - sh).astype(f32)
        kn_slabs.append((e / jnp.sum(e, axis=0, keepdims=True)).astype(cd))
    kn = jnp.concatenate(kn_slabs, axis=0) if g > 1 else kn_slabs[0]

    ctx = jax.lax.dot_general(
        kn.reshape(g, n, hidden), v.reshape(g, n, hidden),
        (((1,), (1,)), ((0,), (0,))), preferred_element_type=f32,
    ).reshape(g * hidden, hidden)
    ctx = (ctx * jnp.tile(segf, (g, 1))).astype(cd)
    wout = wout_ref[...].astype(cd)
    cw = jnp.dot(ctx, wout, preferred_element_type=f32).astype(cd)
    o = jax.lax.dot_general(
        qn.reshape(g, n, hidden), cw.reshape(g, hidden, c),
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32,
    ).reshape(gn, c) + bout_ref[...].astype(f32)

    ohat_slabs, inv2 = [], []
    for gi in range(g):
        sl = o[gi * n : (gi + 1) * n]
        mu = jnp.sum(sl) / (n * c)
        var = jnp.sum(sl * sl) / (n * c) - mu * mu
        iv = jax.lax.rsqrt(var + eps)
        inv2.append(iv)
        ohat_slabs.append((sl - mu) * iv)
    ohat = jnp.concatenate(ohat_slabs, axis=0) if g > 1 else ohat_slabs[0]

    # ---------- backward chain ----------------------------------------------
    g2s = g2s_ref[...].astype(f32)
    # GN2: per-channel affine grads; per-item stats backward
    dg2_c = jnp.sum(dy * ohat, axis=0, keepdims=True)
    db2_c = jnp.sum(dy, axis=0, keepdims=True)
    dhat2 = dy * g2s
    do_slabs = []
    for gi in range(g):
        dsl = dhat2[gi * n : (gi + 1) * n]
        osl = ohat[gi * n : (gi + 1) * n]
        m1 = jnp.sum(dsl) / (n * c)
        m2 = jnp.sum(dsl * osl) / (n * c)
        do_slabs.append((dsl - m1 - osl * m2) * inv2[gi])
    do = jnp.concatenate(do_slabs, axis=0) if g > 1 else do_slabs[0]
    dbout_c = jnp.sum(do, axis=0, keepdims=True)
    do_cd = do.astype(cd)

    # out projection: dqn = do @ cwT (per item), dcw = qnT @ do (per item)
    dqn = jax.lax.dot_general(
        do_cd.reshape(g, n, c), cw.reshape(g, hidden, c),
        (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32,
    ).reshape(gn, hidden)
    dcw = jax.lax.dot_general(
        qn.reshape(g, n, hidden), do_cd.reshape(g, n, c),
        (((1,), (1,)), ((0,), (0,))), preferred_element_type=f32,
    ).reshape(g * hidden, c)
    dcw_cd = dcw.astype(cd)
    dwout_c = jnp.dot(ctx.T, dcw_cd, preferred_element_type=f32)
    dctx = (jnp.dot(dcw_cd, wout.T, preferred_element_type=f32)
            * jnp.tile(segf, (g, 1))).astype(cd)

    # context: dkn = v @ dctxT, dv = kn @ dctx  (per item)
    dkn = jax.lax.dot_general(
        v.reshape(g, n, hidden), dctx.reshape(g, hidden, hidden),
        (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32,
    ).reshape(gn, hidden)
    dv = jax.lax.dot_general(
        kn.reshape(g, n, hidden), dctx.reshape(g, hidden, hidden),
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32,
    ).reshape(gn, hidden)

    # k softmax backward: per item, per column
    knf = kn.astype(f32)
    dk_slabs = []
    for gi in range(g):
        ksl = knf[gi * n : (gi + 1) * n]
        dsl = dkn[gi * n : (gi + 1) * n]
        inner = jnp.sum(ksl * dsl, axis=0, keepdims=True)
        dk_slabs.append(ksl * (dsl - inner))
    dk = jnp.concatenate(dk_slabs, axis=0) if g > 1 else dk_slabs[0]

    # q softmax backward: per row, per head block (seg matmul for the rowsum)
    qnf = qn.astype(f32)
    rowdot = jnp.dot((qnf * dqn).astype(cd), seg, preferred_element_type=f32)
    dq = qnf * (dqn - rowdot / scale)

    # projections: dh and weight grads
    dq_cd = dq.astype(cd)
    dk_cd = dk.astype(cd)
    dv_cd = dv.astype(cd)
    dh = (jnp.dot(dq_cd, wq.T, preferred_element_type=f32)
          + jnp.dot(dk_cd, wk.T, preferred_element_type=f32)
          + jnp.dot(dv_cd, wv.T, preferred_element_type=f32))
    dwq = jnp.dot(h.T, dq_cd, preferred_element_type=f32)
    dwk = jnp.dot(h.T, dk_cd, preferred_element_type=f32)
    dwv = jnp.dot(h.T, dv_cd, preferred_element_type=f32)
    dwqkv_c = jnp.concatenate([dwq, dwk, dwv], axis=1)

    # GN1 backward + residual
    dg1_c = jnp.sum(dh * xhat, axis=0, keepdims=True)
    db1_c = jnp.sum(dh, axis=0, keepdims=True)
    dhat1 = dh * g1s
    dx_slabs = []
    for gi in range(g):
        dsl = dhat1[gi * n : (gi + 1) * n]
        xsl = xhat[gi * n : (gi + 1) * n]
        m1 = jnp.sum(dsl) / (n * c)
        m2 = jnp.sum(dsl * xsl) / (n * c)
        dx_slabs.append((dsl - m1 - xsl * m2) * inv1[gi])
    dxg = jnp.concatenate(dx_slabs, axis=0) if g > 1 else dx_slabs[0]
    dx_ref[...] = (dy + dxg).astype(dx_ref.dtype).reshape(g, n, c)

    # ---------- cross-program accumulation (sequential TPU grid) -------------
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dbout_ref[...] = jnp.zeros_like(dbout_ref)
        dg1s_ref[...] = jnp.zeros_like(dg1s_ref)
        dg1b_ref[...] = jnp.zeros_like(dg1b_ref)
        dg2s_ref[...] = jnp.zeros_like(dg2s_ref)
        dg2b_ref[...] = jnp.zeros_like(dg2b_ref)

    dwqkv_ref[...] += dwqkv_c
    dwout_ref[...] += dwout_c
    dbout_ref[...] += dbout_c
    dg1s_ref[...] += dg1_c
    dg1b_ref[...] += db1_c
    dg2s_ref[...] += dg2_c
    dg2b_ref[...] += db2_c


# Fastest measured items-per-program (perf/probe6.py, probe7*, probe14 for the
# packed C=64 entries): keyed by TPU generation then (N, C) — the fused
# buffers scale with N*C so the same G works across batch sizes, but the G
# values are VMEM-footprint-tuned for the generation they were measured on
# (v5e: 128 MB HBM bandwidth class, ~128 KB/core VMEM budget per buffer set).
# On an unmeasured generation `prefer_pallas` returns False and the XLA path
# serves (VERDICT round 2, weak #6).  Fallback for explicit impl="pallas" on
# untabled shapes: largest divisor of B that keeps the block under ~2 MB of
# bf16 input.
_BLOCK_ITEMS_BY_KIND = {
    "TPU v5 lite": {(1024, 64): 4, (256, 128): 16, (64, 256): 32,
                    (16, 512): 32, (256, 64): 16,
                    # 64x64 resolution axis (perf/probe44.json, 2B=128):
                    # fwd 1.12-1.73x and fwd+bwd 1.17-2.56x over XLA per
                    # block; G*N caps at 4096 rows — one step up VMEM-fails
                    # at every shape (same wall probe7b hit at C=64).
                    (4096, 64): 1, (1024, 128): 4, (256, 256): 16,
                    (64, 512): 32},
}
# Back-compat alias used by perf probes / tests: the v5e table.
_BLOCK_ITEMS = _BLOCK_ITEMS_BY_KIND["TPU v5 lite"]

# Backward-kernel G overrides (perf/probe20.json).  The per-block fwd+bwd
# microbench has high run-to-run variance over the tunnel (probe18 vs
# probe18b: XLA baselines swung 2x), so only the DECISIVE finding is tabled:
# at (64, 256) G=8 pathologically spills (40.6 ms vs 6.1 at G=32) and the
# full fwd G=32 wins over the halved heuristic's 16 by ~8%/block.  All other
# shapes use half the forward's G (the full-train-step A/B measured the
# swept per-shape "winners" within noise of the heuristic: 143.2 vs
# 144.3-147.2 steps/s).
_BLOCK_ITEMS_BWD_BY_KIND = {
    "TPU v5 lite": {(64, 256): 32},
}


def _device_kind() -> str:
    """First device's kind, e.g. "TPU v5 lite" — '' when unavailable."""
    try:
        return jax.devices()[0].device_kind
    except Exception:
        return ""


def _tuned_table() -> dict:
    """The measured G-table for the current device generation ({} if none)."""
    kind = _device_kind()
    for prefix, table in _BLOCK_ITEMS_BY_KIND.items():
        if kind.startswith(prefix):
            return table
    return {}


def _fit_divisor(want: int, b: int) -> int:
    want = min(want, b)  # O(want) fallback loop must not scan past the batch
    while b % want:
        want -= 1
    return max(1, want)


def _pick_block_items(b: int, n: int, c: int) -> int:
    tabled = _tuned_table().get((n, c)) or _BLOCK_ITEMS.get((n, c))
    want = tabled or max(1, (2 << 20) // max(1, n * c * 2))
    return _fit_divisor(want, b)


def _pick_block_items_bwd(b: int, n: int, c: int) -> int:
    """Measured backward-kernel G for this device kind (perf/probe20.json);
    unswept shapes use half the forward's G (VMEM-headroom heuristic)."""
    kind = _device_kind()
    for prefix, table in _BLOCK_ITEMS_BWD_BY_KIND.items():
        if kind.startswith(prefix) and (n, c) in table:
            return _fit_divisor(table[(n, c)], b)
    return _fit_divisor(max(1, _pick_block_items(b, n, c) // 2), b)


def prefer_pallas(b: int, n: int, c: int, dtype=None) -> bool:
    """True when the fused kernel is the measured winner for this shape.

    The kernel beat the XLA path at every flagship (N, C) level once the
    per-item reductions went slice-wise (perf/probe7b/7c.json: 1.16-1.79x),
    but only at the measured G on the generation it was measured on — require
    a G-table entry for THIS device kind (v5e is the only tuned generation;
    an untuned v4/v6e would otherwise silently run v5e VMEM-sized blocks),
    the tabled G to divide the batch, a real TPU backend (the kernel needs
    Mosaic; CPU tests interpret-force it), and the bf16 compute the table was
    measured at (fp32 doubles the VMEM footprint the G table was sized
    against).
    """
    g = _tuned_table().get((n, c))
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
    # Rank-1 params go in as (1, C) rows — Mosaic layouts want rank >= 2.
    row = lambda p: p.reshape(1, -1)  # noqa: E731
    full = lambda shape: pl.BlockSpec(  # noqa: E731 — whole-array, VMEM-resident
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    hidden = heads * dim_head
    if c * 2 == hidden and n % 2 == 0:
        # C=64 sites: pixel-pair packed layout (see _fused_kernel_packed) —
        # full 128-lane rows end to end, half the DMA bytes of the padded
        # channel-minor form.  Packing/tiling happens here in XLA where the
        # reshapes fuse into the producers for free.
        np_ = n // 2
        xp = x.reshape(b, np_, 2 * c)
        zeros = jnp.zeros_like(wqkv)
        wqkv2 = jnp.concatenate(
            [jnp.concatenate([wqkv, zeros], axis=1),
             jnp.concatenate([zeros, wqkv], axis=1)], axis=0
        )  # (2C, 6H) = diag(Wqkv, Wqkv)
        tile2 = lambda p: jnp.concatenate([p, p]).reshape(1, -1)  # noqa: E731
        kernel = functools.partial(
            _fused_kernel_packed, heads=heads, dim_head=dim_head, eps=eps,
            compute_dtype=compute_dtype,
        )
        out = pl.pallas_call(
            kernel,
            grid=(b // g,),
            in_specs=[
                pl.BlockSpec((g, np_, 2 * c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                full(wqkv2.shape), full(wout.shape), full((1, 2 * c)),
                full((1, 2 * c)), full((1, 2 * c)), full((1, 2 * c)),
                full((1, 2 * c)),
            ],
            out_specs=pl.BlockSpec(
                (g, np_, 2 * c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((b, np_, 2 * c), x.dtype),
            interpret=interpret,
        )(xp, wqkv2, wout, tile2(bout), tile2(gn1_scale), tile2(gn1_bias),
          tile2(gn2_scale), tile2(gn2_bias))
        return out.reshape(b, n, c)
    kernel = functools.partial(
        _fused_kernel, heads=heads, dim_head=dim_head, eps=eps,
        compute_dtype=compute_dtype,
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


def _fused_kernel_packed_bwd(
    xp_ref, dyp_ref, wqkv2_ref, wout_ref, bout2_ref, g1s2_ref, g1b2_ref,
    g2s2_ref, g2b2_ref,
    dx_ref, dwqkv2_ref, dwout_ref, dbout2_ref, dg1s2_ref, dg1b2_ref,
    dg2s2_ref, dg2b2_ref,
    *, heads: int, dim_head: int, eps: float, compute_dtype,
):
    """Backward of the pixel-pair-packed C=64 kernel (`_fused_kernel_packed`).

    Same derivation as ``_fused_kernel_bwd``, kept 128-lane-aligned end to
    end like the packed forward:

    * GN backward runs on the packed (N/2, 2C) slab with (1, 2C) tiled affine
      rows; packed affine/bias grads are folded to (C,) by the WRAPPER
      (dp[:C] + dp[C:]), outside the kernel where the add fuses for free;
    * the output-projection backward goes through the per-item block-diagonal
      (2H, 2C) matmul: dqp = dôp @ ctxw2ᵀ and dctxw2 = qpᵀ @ dôp — no
      64-lane-offset activation slicing anywhere (only the per-item (2H, 2C)
      WEIGHT-grad fold slices C columns, which is weight-sized, not
      activation-sized);
    * the shared-denominator k softmax backward subtracts the per-column sum
      of kn⊙dkn over BOTH halves;
    * dh and dWqkv2 use the packed (2C, 6H) weight in single matmuls; the
      wrapper folds dWqkv2's two diagonal blocks into the true (C, 3H) grad.
    """
    cd = compute_dtype
    f32 = jnp.float32
    g, np_, c2 = xp_ref.shape
    gnp = g * np_
    hidden = heads * dim_head
    c = c2 // 2
    scale = dim_head ** -0.5
    m_elems = np_ * c2  # == N * C per item
    xp = xp_ref[...].reshape(gnp, c2)
    dyp = dyp_ref[...].reshape(gnp, c2).astype(f32)
    xf = xp.astype(f32)

    row_h = jax.lax.broadcasted_iota(jnp.int32, (hidden, hidden), 0) // dim_head
    col_h = jax.lax.broadcasted_iota(jnp.int32, (hidden, hidden), 1) // dim_head
    seg = (row_h == col_h).astype(cd)
    segf = seg.astype(f32)

    # ---------- forward recompute (packed; mirrors _fused_kernel_packed) ----
    g1s2 = g1s2_ref[...].astype(f32)
    g1b2 = g1b2_ref[...].astype(f32)
    xhat_slabs, inv1 = [], []
    for gi in range(g):
        sl = xf[gi * np_ : (gi + 1) * np_]
        mu = jnp.sum(sl) / m_elems
        var = jnp.sum(sl * sl) / m_elems - mu * mu
        iv = jax.lax.rsqrt(var + eps)
        inv1.append(iv)
        xhat_slabs.append((sl - mu) * iv)
    xhat = jnp.concatenate(xhat_slabs, axis=0) if g > 1 else xhat_slabs[0]
    h = (xhat * g1s2 + g1b2).astype(cd)

    w2 = wqkv2_ref[...].astype(cd)
    q0 = jnp.dot(h, w2[:, :hidden], preferred_element_type=f32).astype(cd)
    k0 = jnp.dot(h, w2[:, hidden : 2 * hidden],
                 preferred_element_type=f32).astype(cd)
    v0 = jnp.dot(h, w2[:, 2 * hidden : 3 * hidden],
                 preferred_element_type=f32).astype(cd)
    q1 = jnp.dot(h, w2[:, 3 * hidden : 4 * hidden],
                 preferred_element_type=f32).astype(cd)
    k1 = jnp.dot(h, w2[:, 4 * hidden : 5 * hidden],
                 preferred_element_type=f32).astype(cd)
    v1 = jnp.dot(h, w2[:, 5 * hidden :],
                 preferred_element_type=f32).astype(cd)

    def q_softmax(qh):
        shift = qh.astype(f32).max(axis=-1, keepdims=True).astype(cd)
        q_e = jnp.exp(qh - shift)
        q_sum = jnp.dot(q_e, seg, preferred_element_type=f32)
        return (q_e.astype(f32) / q_sum * scale).astype(cd)

    q0n, q1n = q_softmax(q0), q_softmax(q1)

    k0n_slabs, k1n_slabs = [], []
    for gi in range(g):
        s0c = k0[gi * np_ : (gi + 1) * np_]
        s1c = k1[gi * np_ : (gi + 1) * np_]
        ksh = jnp.maximum(
            s0c.astype(f32).max(axis=0, keepdims=True),
            s1c.astype(f32).max(axis=0, keepdims=True),
        ).astype(cd)
        s0 = jnp.exp(s0c - ksh).astype(f32)
        s1 = jnp.exp(s1c - ksh).astype(f32)
        denom = jnp.sum(s0, axis=0, keepdims=True) + jnp.sum(
            s1, axis=0, keepdims=True
        )
        k0n_slabs.append((s0 / denom).astype(cd))
        k1n_slabs.append((s1 / denom).astype(cd))
    k0n = jnp.concatenate(k0n_slabs, axis=0) if g > 1 else k0n_slabs[0]
    k1n = jnp.concatenate(k1n_slabs, axis=0) if g > 1 else k1n_slabs[0]

    ctx = jax.lax.dot_general(
        k0n.reshape(g, np_, hidden), v0.reshape(g, np_, hidden),
        (((1,), (1,)), ((0,), (0,))), preferred_element_type=f32,
    ) + jax.lax.dot_general(
        k1n.reshape(g, np_, hidden), v1.reshape(g, np_, hidden),
        (((1,), (1,)), ((0,), (0,))), preferred_element_type=f32,
    )
    ctx = (ctx.reshape(g * hidden, hidden)
           * jnp.tile(segf, (g, 1))).astype(cd)
    wout = wout_ref[...].astype(cd)
    cw = jnp.dot(ctx, wout, preferred_element_type=f32).astype(cd)

    sel_i = jax.lax.broadcasted_iota(jnp.int32, (c, c2), 0)
    sel_j = jax.lax.broadcasted_iota(jnp.int32, (c, c2), 1)
    sel0 = (sel_i == sel_j).astype(cd)
    sel1 = (sel_i == sel_j - c).astype(cd)
    cw0 = jnp.dot(cw, sel0, preferred_element_type=f32).astype(cd)
    cw1 = jnp.dot(cw, sel1, preferred_element_type=f32).astype(cd)

    qp = jnp.concatenate([q0n, q1n], axis=1)  # (gnp, 2H)
    o_slabs, ctxw2_slabs = [], []
    for gi in range(g):
        ctxw2 = jnp.concatenate(
            [cw0[gi * hidden : (gi + 1) * hidden],
             cw1[gi * hidden : (gi + 1) * hidden]], axis=0
        )  # (2H, 2C)
        ctxw2_slabs.append(ctxw2)
        o_slabs.append(
            jnp.dot(qp[gi * np_ : (gi + 1) * np_], ctxw2,
                    preferred_element_type=f32)
        )
    o = (jnp.concatenate(o_slabs, axis=0) if g > 1 else o_slabs[0]) \
        + bout2_ref[...].astype(f32)

    ohat_slabs, inv2 = [], []
    for gi in range(g):
        sl = o[gi * np_ : (gi + 1) * np_]
        mu = jnp.sum(sl) / m_elems
        var = jnp.sum(sl * sl) / m_elems - mu * mu
        iv = jax.lax.rsqrt(var + eps)
        inv2.append(iv)
        ohat_slabs.append((sl - mu) * iv)
    ohat = jnp.concatenate(ohat_slabs, axis=0) if g > 1 else ohat_slabs[0]

    # ---------- backward chain (packed) --------------------------------------
    g2s2 = g2s2_ref[...].astype(f32)
    dg2_c = jnp.sum(dyp * ohat, axis=0, keepdims=True)   # (1, 2C) packed
    db2_c = jnp.sum(dyp, axis=0, keepdims=True)
    dhat2 = dyp * g2s2
    do_slabs = []
    for gi in range(g):
        dsl = dhat2[gi * np_ : (gi + 1) * np_]
        osl = ohat[gi * np_ : (gi + 1) * np_]
        m1 = jnp.sum(dsl) / m_elems
        m2 = jnp.sum(dsl * osl) / m_elems
        do_slabs.append((dsl - m1 - osl * m2) * inv2[gi])
    do = jnp.concatenate(do_slabs, axis=0) if g > 1 else do_slabs[0]
    dbout_c = jnp.sum(do, axis=0, keepdims=True)         # (1, 2C) packed
    do_cd = do.astype(cd)

    # through the per-item block-diag output matmul: dqp, dctxw2
    dqp_slabs, dcw_slabs = [], []
    for gi in range(g):
        ctxw2 = ctxw2_slabs[gi]
        dosl = do_cd[gi * np_ : (gi + 1) * np_]
        dqp_slabs.append(
            jnp.dot(dosl, ctxw2.T, preferred_element_type=f32)
        )  # (np, 2H)
        dctxw2 = jnp.dot(qp[gi * np_ : (gi + 1) * np_].T, dosl,
                         preferred_element_type=f32)  # (2H, 2C)
        # fold the two diagonal blocks into this item's dcw (H, C)
        dcw_slabs.append(dctxw2[:hidden, :c] + dctxw2[hidden:, c:])
    dqp = jnp.concatenate(dqp_slabs, axis=0) if g > 1 else dqp_slabs[0]
    dcw = jnp.concatenate(dcw_slabs, axis=0) if g > 1 else dcw_slabs[0]
    dq0n = dqp[:, :hidden]
    dq1n = dqp[:, hidden:]
    dcw_cd = dcw.astype(cd)  # (g*H, C)
    dwout_c = jnp.dot(ctx.T, dcw_cd, preferred_element_type=f32)
    dctx = (jnp.dot(dcw_cd, wout.T, preferred_element_type=f32)
            * jnp.tile(segf, (g, 1))).astype(cd)

    dkn0 = jax.lax.dot_general(
        v0.reshape(g, np_, hidden), dctx.reshape(g, hidden, hidden),
        (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32,
    ).reshape(gnp, hidden)
    dkn1 = jax.lax.dot_general(
        v1.reshape(g, np_, hidden), dctx.reshape(g, hidden, hidden),
        (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32,
    ).reshape(gnp, hidden)
    dv0 = jax.lax.dot_general(
        k0n.reshape(g, np_, hidden), dctx.reshape(g, hidden, hidden),
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32,
    ).reshape(gnp, hidden)
    dv1 = jax.lax.dot_general(
        k1n.reshape(g, np_, hidden), dctx.reshape(g, hidden, hidden),
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32,
    ).reshape(gnp, hidden)

    # shared-denominator k softmax backward: per item, per column, both halves
    k0f = k0n.astype(f32)
    k1f = k1n.astype(f32)
    dk0_slabs, dk1_slabs = [], []
    for gi in range(g):
        s = slice(gi * np_, (gi + 1) * np_)
        inner = (jnp.sum(k0f[s] * dkn0[s], axis=0, keepdims=True)
                 + jnp.sum(k1f[s] * dkn1[s], axis=0, keepdims=True))
        dk0_slabs.append(k0f[s] * (dkn0[s] - inner))
        dk1_slabs.append(k1f[s] * (dkn1[s] - inner))
    dk0 = jnp.concatenate(dk0_slabs, axis=0) if g > 1 else dk0_slabs[0]
    dk1 = jnp.concatenate(dk1_slabs, axis=0) if g > 1 else dk1_slabs[0]

    def q_softmax_bwd(qhn, dqhn):
        qf = qhn.astype(f32)
        rowdot = jnp.dot((qf * dqhn).astype(cd), seg,
                         preferred_element_type=f32)
        return qf * (dqhn - rowdot / scale)

    dq0 = q_softmax_bwd(q0n, dq0n)
    dq1 = q_softmax_bwd(q1n, dq1n)

    # packed projections backward: one (gnp, 6H) @ (6H, 2C) matmul for dh and
    # one (2C, gnp) @ (gnp, 6H) for the packed weight grad
    dqkv = jnp.concatenate(
        [dq0.astype(cd), dk0.astype(cd), dv0.astype(cd),
         dq1.astype(cd), dk1.astype(cd), dv1.astype(cd)], axis=1
    )  # (gnp, 6H), 128-aligned blocks
    dh = jnp.dot(dqkv, w2.T, preferred_element_type=f32)
    dwqkv2_c = jnp.dot(h.T, dqkv, preferred_element_type=f32)  # (2C, 6H)

    # GN1 backward + residual (packed slab, tiled affine)
    dg1_c = jnp.sum(dh * xhat, axis=0, keepdims=True)    # (1, 2C) packed
    db1_c = jnp.sum(dh, axis=0, keepdims=True)
    dhat1 = dh * g1s2
    dx_slabs = []
    for gi in range(g):
        dsl = dhat1[gi * np_ : (gi + 1) * np_]
        xsl = xhat[gi * np_ : (gi + 1) * np_]
        m1 = jnp.sum(dsl) / m_elems
        m2 = jnp.sum(dsl * xsl) / m_elems
        dx_slabs.append((dsl - m1 - xsl * m2) * inv1[gi])
    dxg = jnp.concatenate(dx_slabs, axis=0) if g > 1 else dx_slabs[0]
    dx_ref[...] = (dyp + dxg).astype(dx_ref.dtype).reshape(g, np_, c2)

    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv2_ref[...] = jnp.zeros_like(dwqkv2_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dbout2_ref[...] = jnp.zeros_like(dbout2_ref)
        dg1s2_ref[...] = jnp.zeros_like(dg1s2_ref)
        dg1b2_ref[...] = jnp.zeros_like(dg1b2_ref)
        dg2s2_ref[...] = jnp.zeros_like(dg2s2_ref)
        dg2b2_ref[...] = jnp.zeros_like(dg2b2_ref)

    dwqkv2_ref[...] += dwqkv2_c
    dwout_ref[...] += dwout_c
    dbout2_ref[...] += dbout_c
    dg1s2_ref[...] += dg1_c
    dg1b2_ref[...] += db1_c
    dg2s2_ref[...] += dg2_c
    dg2b2_ref[...] += db2_c


def linear_attention_block_pallas_bwd(
    x, dy, wqkv, wout, bout, gn1_scale, gn1_bias, gn2_scale, gn2_bias,
    *, heads: int, dim_head: int, eps: float = 1e-5,
    compute_dtype: Any = jnp.float32, interpret: bool = False,
    block_items: int | None = None,
):
    """Backward pass on TPU: one fused kernel computing all 8 input gradients
    (see ``_fused_kernel_bwd``).  Weight/affine grads are f32 accumulators
    summed across the sequential grid."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x.shape
    hidden = heads * dim_head
    g = block_items or _pick_block_items_bwd(b, n, c)
    while b % g:
        g -= 1
    row = lambda p: p.reshape(1, -1)  # noqa: E731
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    acc = lambda shape: pl.BlockSpec(  # noqa: E731 — grid-accumulated output
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    f32 = jnp.float32
    if c * 2 == hidden and n % 2 == 0:
        # C=64 sites: pixel-pair-packed backward — same layout reasoning as
        # the packed forward (full 128-lane rows, half the DMA bytes)
        np_ = n // 2
        c2 = 2 * c
        xp = x.reshape(b, np_, c2)
        dyp = dy.astype(x.dtype).reshape(b, np_, c2)
        zeros = jnp.zeros_like(wqkv)
        wqkv2 = jnp.concatenate(
            [jnp.concatenate([wqkv, zeros], axis=1),
             jnp.concatenate([zeros, wqkv], axis=1)], axis=0
        )
        tile2 = lambda p: jnp.concatenate([p, p]).reshape(1, -1)  # noqa: E731
        kernel = functools.partial(
            _fused_kernel_packed_bwd, heads=heads, dim_head=dim_head, eps=eps,
            compute_dtype=compute_dtype,
        )
        outs = pl.pallas_call(
            kernel,
            grid=(b // g,),
            in_specs=[
                pl.BlockSpec((g, np_, c2), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g, np_, c2), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                full(wqkv2.shape), full(wout.shape), full((1, c2)),
                full((1, c2)), full((1, c2)), full((1, c2)), full((1, c2)),
            ],
            out_specs=[
                pl.BlockSpec((g, np_, c2), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                acc((c2, 6 * hidden)), acc((hidden, c)), acc((1, c2)),
                acc((1, c2)), acc((1, c2)), acc((1, c2)), acc((1, c2)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, np_, c2), x.dtype),
                jax.ShapeDtypeStruct((c2, 6 * hidden), f32),
                jax.ShapeDtypeStruct((hidden, c), f32),
                jax.ShapeDtypeStruct((1, c2), f32),
                jax.ShapeDtypeStruct((1, c2), f32),
                jax.ShapeDtypeStruct((1, c2), f32),
                jax.ShapeDtypeStruct((1, c2), f32),
                jax.ShapeDtypeStruct((1, c2), f32),
            ],
            interpret=interpret,
        )(xp, dyp, wqkv2, wout, tile2(bout), tile2(gn1_scale),
          tile2(gn1_bias), tile2(gn2_scale), tile2(gn2_bias))
        dx, dwqkv2, dwout, dbout2, dg1s2, dg1b2, dg2s2, dg2b2 = outs
        # fold packed grads back: diag blocks of dWqkv2; halves of (1, 2C) rows
        dwqkv_f = (dwqkv2[:c, : 3 * hidden]
                   + dwqkv2[c:, 3 * hidden :]).astype(wqkv.dtype)
        fold = lambda p, ref: (  # noqa: E731
            (p[0, :c] + p[0, c:]).reshape(ref.shape).astype(ref.dtype)
        )
        return (dx.reshape(b, n, c), dwqkv_f, dwout.astype(wout.dtype),
                fold(dbout2, bout), fold(dg1s2, gn1_scale),
                fold(dg1b2, gn1_bias), fold(dg2s2, gn2_scale),
                fold(dg2b2, gn2_bias))
    kernel = functools.partial(
        _fused_kernel_bwd, heads=heads, dim_head=dim_head, eps=eps,
        compute_dtype=compute_dtype,
    )
    dx, dwqkv, dwout, dbout, dg1s, dg1b, dg2s, dg2b = pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full(wqkv.shape), full(wout.shape), full((1, c)),
            full((1, c)), full((1, c)), full((1, c)), full((1, c)),
        ],
        out_specs=[
            pl.BlockSpec((g, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            acc((c, 3 * hidden)), acc((hidden, c)), acc((1, c)),
            acc((1, c)), acc((1, c)), acc((1, c)), acc((1, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), x.dtype),
            jax.ShapeDtypeStruct((c, 3 * hidden), f32),
            jax.ShapeDtypeStruct((hidden, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
        ],
        interpret=interpret,
    )(x, dy.astype(x.dtype), wqkv, wout, row(bout), row(gn1_scale),
      row(gn1_bias), row(gn2_scale), row(gn2_bias))
    shp = lambda ref, a: a.reshape(ref.shape).astype(ref.dtype)  # noqa: E731
    return (dx, shp(wqkv, dwqkv), shp(wout, dwout), shp(bout, dbout),
            shp(gn1_scale, dg1s), shp(gn1_bias, dg1b), shp(gn2_scale, dg2s),
            shp(gn2_bias, dg2b))


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def linear_attention_block_fused_grads(
    x, wqkv, wout, bout, gn1_scale, gn1_bias, gn2_scale, gn2_bias,
    heads: int = 4, dim_head: int = 32, eps: float = 1e-5,
    compute_dtype: Any = jnp.float32,
):
    """Fused block with BOTH passes in Pallas (round 3, VERDICT item 3).

    Same forward as :func:`linear_attention_block`; the backward runs the
    hand-written ``_fused_kernel_bwd`` instead of recomputing through the XLA
    implementation — gradient programs then keep the fused attention
    formulation end to end (no XLA attention layout copies / GroupNorm-stats
    fusions on the backward path).  Gradients equal the XLA vjp up to bf16
    reduction reordering (tested at 1e-5 in f32 interpret mode).
    """
    return linear_attention_block_pallas(
        x, wqkv, wout, bout, gn1_scale, gn1_bias, gn2_scale, gn2_bias,
        heads=heads, dim_head=dim_head, eps=eps, compute_dtype=compute_dtype,
    )


def _fwd_fused(x, wqkv, wout, bout, g1s, g1b, g2s, g2b, heads, dim_head, eps,
               compute_dtype):
    y = linear_attention_block_fused_grads(
        x, wqkv, wout, bout, g1s, g1b, g2s, g2b, heads, dim_head, eps,
        compute_dtype,
    )
    return y, (x, wqkv, wout, bout, g1s, g1b, g2s, g2b)


def _bwd_fused(heads, dim_head, eps, compute_dtype, residuals, dy):
    return linear_attention_block_pallas_bwd(
        residuals[0], dy, *residuals[1:],
        heads=heads, dim_head=dim_head, eps=eps, compute_dtype=compute_dtype,
    )


linear_attention_block_fused_grads.defvjp(_fwd_fused, _bwd_fused)
