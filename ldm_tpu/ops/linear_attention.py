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
                    (16, 512): 32, (256, 64): 16},
}
# Back-compat alias used by perf probes / tests: the v5e table.
_BLOCK_ITEMS = _BLOCK_ITEMS_BY_KIND["TPU v5 lite"]


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


def _pick_block_items(b: int, n: int, c: int) -> int:
    tabled = _tuned_table().get((n, c)) or _BLOCK_ITEMS.get((n, c))
    want = tabled or max(1, (2 << 20) // max(1, n * c * 2))
    want = min(want, b)  # O(want) fallback loop must not scan past the batch
    while b % want:
        want -= 1
    return max(1, want)


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
