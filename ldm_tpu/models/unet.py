"""Class- and time-conditional U-Net noise predictor (flax, NHWC).

Same architecture family as the reference (src/UNet.py:293-389): 3x3 stem conv →
4-level encoder (ResNet block → linear attention → 2x2 max-pool, skips collected
pre-pool) → bottleneck (ResNet → full attention → ResNet) → decoder (2x2
transposed conv → concat skip → ResNet block → linear attention) → final ResNet
block + 1x1 conv.  Time conditioning is a sinusoidal embedding through a 2-layer
GELU MLP (src/UNet.py:251-273) with d_time = 4*channels (src/UNet.py:321); class
conditioning is an embedding ADDED to the time embedding (src/UNet.py:329,375-376).

TPU-first deviations (recorded in PARITY.md):

* NHWC layout, not NCHW — convs/norms hit the MXU/VPU in the hardware-native layout;
* compute dtype is configurable (bf16 under ``use_amp``) with fp32 params; GroupNorm
  statistics stay fp32 (flax default);
* the unconditional pass uses a reserved ``null_label`` (== num_classes) whose
  embedding is exactly zero, so classifier-free guidance can run cond+uncond fused in
  ONE batched forward (the reference's ``y=None`` skip at src/UNet.py:375-376 forces
  two separate calls per sampling step);
* the reference bottleneck drops the time embedding (bug, src/UNet.py:287-290);
  here the bottleneck ResNet blocks receive it.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ldm_tpu.registry import register

Array = jax.Array
Dtype = Any


class SinusoidalPosEmb(nn.Module):
    """Sinusoidal timestep embedding (reference src/UNet.py:23-44)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: Array) -> Array:
        half = self.dim // 2
        freq = jnp.exp(
            jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1))
        )
        ang = t.astype(jnp.float32)[:, None] * freq[None, :]
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1).astype(self.dtype)


class TimeEmbedding(nn.Module):
    """SinPos → Dense → GELU → Dense (reference src/UNet.py:251-273)."""

    n_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: Array) -> Array:
        x = SinusoidalPosEmb(self.n_channels // 4, dtype=self.dtype)(t)
        x = nn.Dense(self.n_channels, dtype=self.dtype)(x)
        # exact (erf) GELU — torch nn.GELU's default, reference src/UNet.py:266
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.n_channels, dtype=self.dtype)(x)


class Block(nn.Module):
    """GroupNorm → SiLU → 3x3 conv (reference src/UNet.py:47-58)."""

    dim_out: int
    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.silu(x)
        return nn.Conv(self.dim_out, (3, 3), padding=1, dtype=self.dtype)(x)


class ResNetBlock(nn.Module):
    """Two Blocks with the time embedding injected in between + 1x1 shortcut
    (reference src/UNet.py:61-99)."""

    dim_out: int
    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, time_emb: Optional[Array] = None) -> Array:
        h = Block(self.dim_out, self.groups, dtype=self.dtype)(x)
        if time_emb is not None:
            temb = nn.Dense(self.dim_out, dtype=self.dtype)(nn.silu(time_emb))
            h = h + temb[:, None, None, :]
        h = Block(self.dim_out, self.groups, dtype=self.dtype)(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype)(x)
        return h + x


def _split_heads(x: Array, heads: int) -> Array:
    """(B, H, W, h*d) → (B, h, H*W, d)."""
    b, hh, ww, c = x.shape
    x = x.reshape(b, hh * ww, heads, c // heads)
    return x.transpose(0, 2, 1, 3)


def _merge_heads(x: Array, hh: int, ww: int) -> Array:
    """(B, h, N, d) → (B, H, W, h*d), h-major channel order like the reference's
    ``rearrange(out, "b h (x y) d -> b (h d) x y")`` (src/UNet.py:135)."""
    b, heads, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, hh, ww, heads * d)


class Attention(nn.Module):
    """Full softmax self-attention over the spatial grid, 4 heads x 32
    (reference src/UNet.py:113-136).  Used only in the bottleneck."""

    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, hh, ww, c = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, self.heads) * (self.dim_head**-0.5)
        k = _split_heads(k, self.heads)
        v = _split_heads(v, self.heads)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k).astype(jnp.float32)
        sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = _merge_heads(out, hh, ww)
        return nn.Dense(c, dtype=self.dtype)(out)


class LinearAttention(nn.Module):
    """Linear attention via the k·v context trick (reference src/UNet.py:139-164).

    Softmax over the head dim for q and over the sequence for k, then
    ``context = k^T v`` (d x e) and ``out = context q`` — O(N·d·e) instead of O(N^2).
    Used at every encoder/decoder level.

    TPU-first formulation (same math as the reference, profiled on a v5e chip —
    this block dominates the sampling step, ~70% of UNet time in the naive form):

    * no per-head transposes — q/k/v stay in (B, N, heads*dim_head) layout with
      h-major channel order (identical to the reference's
      ``rearrange("b (h d) n -> ...")`` ordering);
    * the per-head ``k^T v`` contractions (32x32 outputs — MXU-starving) become ONE
      (hidden x hidden) = 128x128 matmul masked to its block diagonal: 4x the
      nominal FLOPs of the per-head form but a perfectly MXU-shaped contraction,
      measurably ~1.5x faster end to end;
    * the output projection is folded into the context:
      ``q @ (context @ W_out)`` needs one N-length matmul instead of two.
    """

    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, hh, ww, c = x.shape
        n = hh * ww
        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype)(
            x.reshape(b, n, c)
        )
        q, k, v = jnp.split(qkv, 3, axis=-1)  # (B, N, hidden), h-major channels
        # torch layout is (b, h, d, n): q softmax over d, k softmax over n
        # (src/UNet.py:156-157) — here: per-head last-axis slices, and axis 1.
        q = jax.nn.softmax(
            q.reshape(b, n, self.heads, self.dim_head).astype(jnp.float32), axis=-1
        )
        q = (q * (self.dim_head**-0.5)).reshape(b, n, hidden).astype(self.dtype)
        k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(self.dtype)
        # Full (hidden x hidden) context, masked to per-head diagonal blocks.
        block_diag = jnp.kron(
            jnp.eye(self.heads, dtype=self.dtype),
            jnp.ones((self.dim_head, self.dim_head), self.dtype),
        )
        context = jnp.einsum("bnd,bne->bde", k, v) * block_diag
        w_out = self.param(
            "out_kernel", nn.initializers.lecun_normal(), (hidden, c), jnp.float32
        )
        b_out = self.param("out_bias", nn.initializers.zeros, (c,), jnp.float32)
        ctx_w = jnp.einsum("bde,ec->bdc", context, w_out.astype(self.dtype))
        out = jnp.einsum("bdc,bnd->bnc", ctx_w, q) + b_out.astype(self.dtype)
        out = out.reshape(b, hh, ww, c)
        return nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype)(out)


class PreNormResidual(nn.Module):
    """``x + fn(GroupNorm_1(x))`` — the reference's Residual(PreNorm(fn)) wrapper
    (src/UNet.py:14-20, 102-110)."""

    fn: nn.Module
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype)(x)
        return x + self.fn(h)


class LinAttnBlock(nn.Module):
    """The full per-level attention block — Residual(PreNorm(LinearAttention))
    (reference src/UNet.py:192,230) — as ONE op.

    Two implementations share this module's parameters and numerics policy (fp32
    norm statistics, compute-dtype matmuls with fp32 accumulation):

    * ``"xla"`` (default): the MXU-friendly formulation — block-diagonal context
      matmul, folded out-projection, and (round 2) lane-layout-native softmaxes:
      q's per-head softmax via a global-rowwise-max shift + one segment-sum
      matmul, k's normalization commuted out of the context contraction.  A v5e
      trace showed the previous 4D-reshape q softmax costing ~40% of the block;
      the restructure measured 1.33-1.58x faster per block and +27% on the
      full flagship sampler (runs/perf/, RESULTS.md);
    * ``"pallas"``: a fused Pallas kernel (same algebra) that keeps G batch
      items per grid program and every intermediate in VMEM
      (ldm_tpu/ops/linear_attention.py).  With slice-wise per-item reductions
      it beats the XLA path at every flagship level (1.16-1.79x per block,
      perf/probe7b/7c.json);
    * ``"auto"`` (default, ``impl=None``): pallas on a real TPU at the
      measured (N, C) shapes in bf16, xla everywhere else.

    Gradients always flow through the XLA implementation (custom VJP), so training
    is backend-independent.
    """

    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32
    impl: Optional[str] = None  # None == "auto"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from ldm_tpu.ops.linear_attention import (
            linear_attention_block, linear_attention_block_xla,
            linear_attention_block_xla_heads, prefer_pallas,
        )

        b, hh, ww, c = x.shape
        hidden = self.heads * self.dim_head
        wqkv = self.param(
            "qkv_kernel", nn.initializers.lecun_normal(), (c, 3 * hidden), jnp.float32
        )
        wout = self.param(
            "out_kernel", nn.initializers.lecun_normal(), (hidden, c), jnp.float32
        )
        bout = self.param("out_bias", nn.initializers.zeros, (c,), jnp.float32)
        g1s = self.param("norm_pre_scale", nn.initializers.ones, (c,), jnp.float32)
        g1b = self.param("norm_pre_bias", nn.initializers.zeros, (c,), jnp.float32)
        g2s = self.param("norm_post_scale", nn.initializers.ones, (c,), jnp.float32)
        g2b = self.param("norm_post_bias", nn.initializers.zeros, (c,), jnp.float32)

        impl = self.impl or "auto"
        if impl == "auto":
            # measured per-shape winner on a real TPU; XLA everywhere else
            impl = "pallas" if prefer_pallas(b, hh * ww, c, self.dtype) else "xla"
        elif impl == "auto_grads":
            # gradient programs (round 3): fused Pallas fwd + hand-written
            # Pallas bwd at the measured shapes (+8% full train step,
            # perf/probe18.json), XLA elsewhere
            impl = ("pallas_grads" if prefer_pallas(b, hh * ww, c, self.dtype)
                    else "xla")
        kw = dict(heads=self.heads, dim_head=self.dim_head, compute_dtype=self.dtype)
        if impl == "pallas":
            y = linear_attention_block(
                x.reshape(b, hh * ww, c), wqkv, wout, bout, g1s, g1b, g2s, g2b,
                self.heads, self.dim_head, 1e-5, self.dtype)
        elif impl == "pallas_grads":
            # fused Pallas forward AND hand-written Pallas backward (round 3:
            # gradient programs keep the fused formulation end to end)
            from ldm_tpu.ops.linear_attention import (
                linear_attention_block_fused_grads,
            )

            y = linear_attention_block_fused_grads(
                x.reshape(b, hh * ww, c), wqkv, wout, bout, g1s, g1b, g2s, g2b,
                self.heads, self.dim_head, 1e-5, self.dtype)
        elif impl == "xla_heads":
            # explicit-heads form for tensor-parallel meshes: GSPMD keeps the
            # per-head pipeline rank-local (see ops/linear_attention.py)
            y = linear_attention_block_xla_heads(
                x.reshape(b, hh * ww, c), wqkv, wout, bout, g1s, g1b, g2s, g2b,
                **kw)
        else:
            y = linear_attention_block_xla(
                x.reshape(b, hh * ww, c), wqkv, wout, bout, g1s, g1b, g2s, g2b,
                **kw)
        return y.reshape(b, hh, ww, c)


@register("ldm_tpu.models.unet.UNet")
class UNet(nn.Module):
    """The noise-prediction U-Net (reference src/UNet.py:293-389).

    Constructor surface matches the reference/config schema
    (config_files/*.yaml:20-27): in_channels, out_channels, channels,
    channel_multipliers, with_time_emb, num_classes.
    """

    in_channels: int = 1
    out_channels: int = 1
    channels: int = 64
    channel_multipliers: Sequence[int] = (1, 2, 4, 8)
    with_time_emb: bool = True
    num_classes: Optional[int] = None
    dtype: Dtype = jnp.float32
    # per-level attention implementation: "xla" (default) | "pallas" — see
    # LinAttnBlock for the measured tradeoff
    attention_impl: Optional[str] = None
    # The reference's BottleNeck drops the time embedding (bug,
    # src/UNet.py:287-290); we fix it by default (PARITY.md #6).  False
    # reproduces the reference behavior exactly — used by the whole-model
    # golden parity test.
    bottleneck_time_emb: bool = True

    @property
    def null_label(self) -> int:
        """Label id reserved for the unconditional pass (embeds to exactly zero)."""
        assert self.num_classes is not None
        return self.num_classes

    @nn.compact
    def __call__(
        self, x: Array, t: Array, y: Optional[Array] = None
    ) -> Array:
        chs: List[int] = [self.channels] + [
            self.channels * m for m in self.channel_multipliers
        ]
        d_time = self.channels * 4 if self.with_time_emb else None

        # ----- conditioning ------------------------------------------------
        t_emb = None
        if self.with_time_emb:
            t_emb = TimeEmbedding(d_time, dtype=self.dtype)(t)
            if self.num_classes is not None and y is not None:
                table = nn.Embed(self.num_classes, d_time, dtype=self.dtype)
                is_null = y >= self.num_classes
                safe_y = jnp.where(is_null, 0, y)
                lab = table(safe_y) * (1.0 - is_null.astype(self.dtype))[:, None]
                t_emb = t_emb + lab

        x = x.astype(self.dtype)
        x = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype)(x)

        # ----- encoder (reference src/UNet.py:167-209) ---------------------
        skips: List[Array] = []
        for dim_out in chs[1:]:
            x = ResNetBlock(dim_out, dtype=self.dtype)(x, t_emb)
            x = LinAttnBlock(dtype=self.dtype, impl=self.attention_impl)(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        # ----- bottleneck (reference src/UNet.py:276-290; time-emb drop fixed)
        bt = t_emb if self.bottleneck_time_emb else None
        x = ResNetBlock(chs[-1], dtype=self.dtype)(x, bt)
        x = PreNormResidual(Attention(dtype=self.dtype), dtype=self.dtype)(x)
        x = ResNetBlock(chs[-1], dtype=self.dtype)(x, bt)

        # ----- decoder (reference src/UNet.py:212-248) ----------------------
        # The reference builds the decoder over reversed(channels_list) =
        # [8c,4c,2c,c,c]: each up level is ConvTranspose(dims[i] -> dims[i+1]),
        # concat skip (dims[i] channels), ResNetBlock -> dims[i+1] — i.e. the
        # per-level output ladder is [4c, 2c, c, c].
        for dim_out in list(reversed(chs[1:-1])) + [chs[0]]:
            x = nn.ConvTranspose(
                dim_out, (2, 2), strides=(2, 2), padding="VALID", dtype=self.dtype
            )(x)
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResNetBlock(dim_out, dtype=self.dtype)(x, t_emb)
            x = LinAttnBlock(dtype=self.dtype, impl=self.attention_impl)(x)

        # ----- head (reference src/UNet.py:345-348) -------------------------
        x = ResNetBlock(self.channels, dtype=self.dtype)(x)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)
        return x.astype(jnp.float32)
