"""Explicit (shard_map) spatial partitioning — SP that can TRAIN.

parallel/sp.py's annotation-based SP is forward-exact but its GRADIENTS are
corrupted by this jaxlib's GSPMD partitioned transpose (perf/probe28: the
bottleneck blocks' grads come out exactly data-axis-times the reference; the
pathology lives in the transpose partitioning of the composed program, not in
one op).  This module sidesteps the compiler pass entirely by writing the
partitioned UNet in the explicit-SPMD dialect — ``jax.shard_map`` over the
(data, model) mesh with hand-placed collectives — so reverse-mode AD
differentiates *collectives with exact transposes* (``ppermute`` ↔ reverse
``ppermute``, ``psum`` ↔ broadcast, ``all_gather`` ↔ ``psum_scatter``) instead
of relying on GSPMD to transpose a partitioned graph.  Gradients are exact by
construction (tests/test_sp_explicit.py pins them leaf-for-leaf).

Partitioning (rows of every NHWC activation over the ``model`` axis):

* **3x3 convs** exchange a 1-row halo with each neighbor (``ppermute`` of the
  border rows — ICI traffic proportional to the cut, not the volume); the
  mesh-boundary ranks receive ppermute's zero fill, which IS the conv's zero
  padding.  The conv itself is the stock flax kernel applied VALID on H over
  the halo-extended block.
* **GroupNorm** computes global statistics with one fp32 ``psum`` of the
  per-rank (sum, sum-of-squares) over ``model`` — same fast-variance algebra
  as flax's GroupNorm.
* **2x2 max-pool / 2x2-stride-2 ConvTranspose / 1x1 convs / time-embedding
  MLP** are boundary-free at even local row counts and run as stock local ops.
* **Linear attention stays distributed** — no sequence gather.  The block is
  ASSOCIATIVE over the sequence: the k-softmax needs a global max (``pmax``)
  and a global denominator (``psum`` of per-rank exp-sums, both (B, C)-sized),
  and the context matrix k^T v is a sum over positions — a ``psum`` of
  per-rank (C, C) partial contexts.  Everything else (q softmax, the two
  output contractions, the residual) is per-position.  Collective bytes are
  O(C^2) per block instead of the O(N*C) a row gather would move, and no
  compute is duplicated — the ring-attention-class treatment, exploiting
  linearity instead of a ring.
* **The bottleneck softmax attention** (the one true sequence-global softmax)
  gathers rows, runs the stock block on the full tensor, and keeps the local
  slice — it operates at H/2^L where the whole sequence is a few positions.

The stage functions consume the SAME param tree as ``UNet.__call__``
(models/unet.py; reference architecture src/UNet.py:293-389) via flax
``.apply`` on subtrees, so there is no second set of weights and no drift:
tests pin explicit-SP forward == single-device forward.

Divisibility: H must split into >= 1 even rows per rank at every pooled level
— ``H % (model_axis * 2**n_levels) == 0`` (e.g. 32 % (2*16) == 0 for the
flagship).  ``supports_spatial_training`` reports this so the trainer can
fail fast with a clear message.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, PartitionSpec as P

from ldm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

Array = jax.Array


# ------------------------------------------------------------ local helpers
def _halo_rows(x: Array, k: int) -> Array:
    """Extend the local (B, H_l, W, C) block with each neighbor's border row.

    Rank j receives rank j-1's LAST row above and rank j+1's FIRST row below;
    ranks at the mesh boundary receive ppermute's zero fill — exactly the 3x3
    conv's zero padding."""
    up = jax.lax.ppermute(x[:, -1:], MODEL_AXIS,
                          [(i, i + 1) for i in range(k - 1)])
    dn = jax.lax.ppermute(x[:, :1], MODEL_AXIS,
                          [(i + 1, i) for i in range(k - 1)])
    return jnp.concatenate([up, x, dn], axis=1)


def _conv3x3_sp(p: dict, x: Array, dim_out: int, dt, k: int) -> Array:
    """SAME 3x3 conv on row-sharded x: halo exchange + VALID-on-H stock conv
    (same kernel/bias params as the unsharded nn.Conv(padding=1))."""
    xp = _halo_rows(x, k)
    return nn.Conv(dim_out, (3, 3), padding=((0, 0), (1, 1)),
                   dtype=dt).apply({"params": p}, xp)


def _group_norm_sp(p: dict, x: Array, groups: int, dt,
                   eps: float = 1e-5) -> Array:
    """GroupNorm with GLOBAL (all-rows) statistics: one psum of the per-rank
    fp32 (sum, sum^2) over the model axis; flax's fast-variance algebra."""
    b, hl, w, c = x.shape
    gs = c // groups
    xf = x.astype(jnp.float32).reshape(b, hl, w, groups, gs)
    s1 = jax.lax.psum(xf.sum(axis=(1, 2, 4)), MODEL_AXIS)
    s2 = jax.lax.psum((xf * xf).sum(axis=(1, 2, 4)), MODEL_AXIS)
    n = jnp.float32(hl * jax.lax.axis_size(MODEL_AXIS) * w * gs)
    mean = s1 / n
    var = s2 / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    y = (xf - mean[:, None, None, :, None]) * inv[:, None, None, :, None]
    y = y.reshape(b, hl, w, c)
    return (y * p["scale"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(dt)


def _resnet_block_sp(p: dict, x: Array, temb: Optional[Array], dim_out: int,
                     dt, k: int, groups: int = 8) -> Array:
    """models/unet.py ResNetBlock on row-sharded activations."""
    def block(pb, h):
        h = _group_norm_sp(pb["GroupNorm_0"], h, groups, dt)
        h = nn.silu(h)
        return _conv3x3_sp(pb["Conv_0"], h, dim_out, dt, k)

    h = block(p["Block_0"], x)
    if temb is not None:
        proj = nn.Dense(dim_out, dtype=dt).apply(
            {"params": p["Dense_0"]}, nn.silu(temb))
        h = h + proj[:, None, None, :]
    h = block(p["Block_1"], h)
    if x.shape[-1] != dim_out:
        x = nn.Conv(dim_out, (1, 1), dtype=dt).apply(
            {"params": p["Conv_0"]}, x)
    return h + x


def _gather_rows(x: Array) -> Array:
    return jax.lax.all_gather(x, MODEL_AXIS, axis=1, tiled=True)


def _my_rows(x_full: Array, hl: int) -> Array:
    j = jax.lax.axis_index(MODEL_AXIS)
    return jax.lax.dynamic_slice_in_dim(x_full, j * hl, hl, axis=1)


# ------------------------------------------------------------- full forward
def supports_spatial_training(mesh: Optional[Mesh], image_size: int,
                              n_levels: int) -> bool:
    """True when H splits into even per-rank rows at every pooled level."""
    if mesh is None:
        return False
    k = int(mesh.shape.get(MODEL_AXIS, 1))
    return k > 1 and image_size % (k * 2 ** n_levels) == 0


def make_unet_sp_apply(mesh: Mesh, model):
    """Build the explicit-SP equivalent of ``model.apply`` (same signature:
    ``apply(params, x, t, y) -> eps``), differentiable with exact gradients.

    Linear attention runs distributed (psum of the associative context); the
    bottleneck softmax attention runs the stock module on gathered rows (the
    sequence there is a few positions)."""
    from ldm_tpu.models.unet import Attention, TimeEmbedding

    k = int(mesh.shape[MODEL_AXIS])
    assert k > 1, "explicit SP needs a model axis > 1"
    dt = model.dtype
    chs: List[int] = [model.channels] + [
        model.channels * m for m in model.channel_multipliers
    ]
    L = len(chs) - 1
    d_time = model.channels * 4
    assert model.with_time_emb and model.num_classes is not None, (
        "explicit SP assumes the conditional UNet (the flagship family)")

    heads, dim_head = 4, 32  # LinAttnBlock defaults (models/unet.py)
    hidden = heads * dim_head
    block_diag = jnp.kron(jnp.eye(heads, dtype=dt),
                          jnp.ones((dim_head, dim_head), dt))

    def attn_block(pblk: dict, x: Array) -> Array:
        """LinAttnBlock (Residual(PreNorm(LinearAttention)) + post-norm,
        reference src/UNet.py:139-164,192) on row-sharded x — distributed
        via the block's associativity (module docstring above)."""
        b, hl, w, c = x.shape
        n_l = hl * w
        h = _group_norm_sp({"scale": pblk["norm_pre_scale"],
                            "bias": pblk["norm_pre_bias"]}, x, 1, dt)
        qkv = h.reshape(b, n_l, c) @ pblk["qkv_kernel"].astype(dt)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # q: per-head softmax over dim_head — per-position, fully local
        qf = q.reshape(b, n_l, heads, dim_head).astype(jnp.float32)
        q = (jax.nn.softmax(qf, axis=-1) * dim_head ** -0.5
             ).reshape(b, n_l, hidden).astype(dt)
        # k: softmax over the GLOBAL sequence — stop-gradient max shift
        # (cancels algebraically; pmax has no AD rule, so the (B, hidden)
        # local maxes ride an all_gather) + psum denominator
        kf = k.astype(jnp.float32)
        local_max = jax.lax.stop_gradient(kf.max(axis=1))
        shift = jax.lax.all_gather(local_max, MODEL_AXIS).max(axis=0)
        e = jnp.exp(kf - shift[:, None, :])
        denom = jax.lax.psum(e.sum(axis=1), MODEL_AXIS)
        k = (e / denom[:, None, :]).astype(dt)
        # context k^T v: a sum over positions — psum of (C, C) partials,
        # masked to the per-head diagonal blocks (the MXU-shaped form the
        # single-device block uses, models/unet.py LinearAttention)
        ctx = jax.lax.psum(jnp.einsum("bnd,bne->bde", k, v),
                           MODEL_AXIS) * block_diag
        ctx_w = jnp.einsum("bde,ec->bdc", ctx, pblk["out_kernel"].astype(dt))
        out = (jnp.einsum("bdc,bnd->bnc", ctx_w, q)
               + pblk["out_bias"].astype(dt)).reshape(b, hl, w, c)
        out = _group_norm_sp({"scale": pblk["norm_post_scale"],
                              "bias": pblk["norm_post_bias"]}, out, 1, dt)
        return x + out

    def device_fn(params: Any, x: Array, t: Array, y: Array):
        p = params["params"] if "params" in params else params

        t_emb = TimeEmbedding(d_time, dtype=dt).apply(
            {"params": p["TimeEmbedding_0"]}, t)
        is_null = y >= model.num_classes
        safe_y = jnp.where(is_null, 0, y)
        lab = nn.Embed(model.num_classes, d_time, dtype=dt).apply(
            {"params": p["Embed_0"]}, safe_y)
        t_emb = t_emb + lab * (1.0 - is_null.astype(dt))[:, None]

        x = x.astype(dt)
        x = _conv3x3_sp(p["Conv_0"], x, model.channels, dt, k)

        skips: List[Array] = []
        for i, dim_out in enumerate(chs[1:]):
            x = _resnet_block_sp(p[f"ResNetBlock_{i}"], x, t_emb, dim_out,
                                 dt, k)
            x = attn_block(p[f"LinAttnBlock_{i}"], x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        bt = t_emb if model.bottleneck_time_emb else None
        x = _resnet_block_sp(p[f"ResNetBlock_{L}"], x, bt, chs[-1], dt, k)
        # PreNormResidual(Attention) on gathered rows (bottleneck is tiny)
        hl = x.shape[1]
        xf = _gather_rows(x)
        h = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=dt).apply(
            {"params": p["PreNormResidual_0"]["GroupNorm_0"]}, xf)
        xf = xf + Attention(dtype=dt).apply({"params": p["Attention_0"]}, h)
        x = _my_rows(xf, hl)
        x = _resnet_block_sp(p[f"ResNetBlock_{L + 1}"], x, bt, chs[-1], dt, k)

        for j, dim_out in enumerate(list(reversed(chs[1:-1])) + [chs[0]]):
            x = nn.ConvTranspose(
                dim_out, (2, 2), strides=(2, 2), padding="VALID", dtype=dt
            ).apply({"params": p[f"ConvTranspose_{j}"]}, x)
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = _resnet_block_sp(p[f"ResNetBlock_{L + 2 + j}"], x, t_emb,
                                 dim_out, dt, k)
            x = attn_block(p[f"LinAttnBlock_{L + j}"], x)

        x = _resnet_block_sp(p[f"ResNetBlock_{2 * L + 2}"], x, None,
                             model.channels, dt, k)
        x = nn.Conv(model.out_channels, (1, 1), dtype=dt).apply(
            {"params": p["Conv_1"]}, x)
        return x.astype(jnp.float32)

    sharded = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, MODEL_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS, MODEL_AXIS),
    )

    def apply_fn(params, x, t, y):
        assert x.ndim == 4 and x.shape[1] % (k * 2 ** L) == 0, (
            f"explicit SP needs H % (model_axis * 2^levels) == 0; got "
            f"H={x.shape[1]}, model_axis={k}, levels={L}"
        )
        return sharded(params, x, t, y)

    return apply_fn
