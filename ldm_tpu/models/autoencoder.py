"""Stable-Diffusion-style VAE autoencoder (flax, NHWC).

Rebuild of the reference ``Autoencoder`` (src/Autoencoder.py:383-462): Encoder
(conv_in → 4 resolutions x n ResnetBlocks + strided-conv DownSample with asymmetric
(0,1,0,1) padding → mid block/attn/block → norm/swish/conv_out to 2*z_channels),
``quant_conv`` 1x1 on the moments, GaussianDistribution reparameterized sampling,
``post_quant_conv``, and the mirrored Decoder with nearest-2x UpSample and
``n_resnet_blocks + 1`` blocks per level (src/Autoencoder.py:333).

Functional deviations (PARITY.md): NHWC layout; the latent sampling noise comes from
an explicit PRNG key (the reference buries ``torch.randn_like`` inside
``GaussianDistribution.__init__``, src/Autoencoder.py:36); GroupNorm(32, eps=1e-6)
matches the reference's ``normalization`` helper (src/Autoencoder.py:9-11).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ldm_tpu.registry import register

Array = jax.Array
Dtype = Any


def _norm(channels: int, dtype: Dtype) -> nn.GroupNorm:
    """GroupNorm(32, eps=1e-6) (reference src/Autoencoder.py:9-11); group count
    clamps to the channel count so tiny test models remain valid."""
    return nn.GroupNorm(num_groups=min(32, channels), epsilon=1e-6, dtype=dtype)


class ResnetBlock(nn.Module):
    """norm-swish-conv x2 + 1x1 nin shortcut (reference src/Autoencoder.py:46-84)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.silu(_norm(x.shape[-1], self.dtype)(x))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(h)
        h = nn.silu(_norm(h.shape[-1], self.dtype)(h))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention over the grid (reference
    src/Autoencoder.py:87-139), scale = channels**-0.5."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, hh, ww, c = x.shape
        h = _norm(x.shape[-1], self.dtype)(x)
        q = nn.Dense(c, dtype=self.dtype)(h).reshape(b, hh * ww, c)
        k = nn.Dense(c, dtype=self.dtype)(h).reshape(b, hh * ww, c)
        v = nn.Dense(c, dtype=self.dtype)(h).reshape(b, hh * ww, c)
        sim = jnp.einsum("bic,bjc->bij", q, k).astype(jnp.float32) * (c**-0.5)
        attn = jax.nn.softmax(sim, axis=-1).astype(self.dtype)
        out = jnp.einsum("bij,bjc->bic", attn, v).reshape(b, hh, ww, c)
        out = nn.Dense(c, dtype=self.dtype)(out)
        return x + out


class DownSample(nn.Module):
    """3x3 stride-2 conv with asymmetric (0,1,0,1) zero padding
    (reference src/Autoencoder.py:160-180)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Conv(
            self.channels, (3, 3), strides=2, padding=((0, 1), (0, 1)),
            dtype=self.dtype,
        )(x)


class UpSample(nn.Module):
    """Nearest-neighbor 2x upsample + 3x3 conv (reference src/Autoencoder.py:142-157)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype)(x)


class Encoder(nn.Module):
    """Image → moments (mu ‖ log_var), 2*z_channels (reference src/Autoencoder.py:183-281)."""

    channels: int = 64
    channel_multipliers: Sequence[int] = (1, 2, 4, 8)
    n_resnet_blocks: int = 2
    z_channels: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img: Array) -> Array:
        x = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype)(
            img.astype(self.dtype)
        )
        chs = [m * self.channels for m in [1] + list(self.channel_multipliers)]
        n_res = len(self.channel_multipliers)
        for i in range(n_res):
            for _ in range(self.n_resnet_blocks):
                x = ResnetBlock(chs[i + 1], dtype=self.dtype)(x)
            if i != n_res - 1:
                x = DownSample(chs[i + 1], dtype=self.dtype)(x)
        x = ResnetBlock(chs[-1], dtype=self.dtype)(x)
        x = AttnBlock(dtype=self.dtype)(x)
        x = ResnetBlock(chs[-1], dtype=self.dtype)(x)
        x = nn.silu(_norm(x.shape[-1], self.dtype)(x))
        return nn.Conv(2 * self.z_channels, (3, 3), padding=1, dtype=self.dtype)(x)


class Decoder(nn.Module):
    """Latent → image (reference src/Autoencoder.py:284-380); note
    ``n_resnet_blocks + 1`` blocks per level (src/Autoencoder.py:333)."""

    channels: int = 64
    channel_multipliers: Sequence[int] = (1, 2, 4, 8)
    n_resnet_blocks: int = 2
    out_channels: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Array) -> Array:
        chs = [m * self.channels for m in self.channel_multipliers]
        x = nn.Conv(chs[-1], (3, 3), padding=1, dtype=self.dtype)(
            z.astype(self.dtype)
        )
        x = ResnetBlock(chs[-1], dtype=self.dtype)(x)
        x = AttnBlock(dtype=self.dtype)(x)
        x = ResnetBlock(chs[-1], dtype=self.dtype)(x)
        for i in reversed(range(len(chs))):
            for _ in range(self.n_resnet_blocks + 1):
                x = ResnetBlock(chs[i], dtype=self.dtype)(x)
            if i != 0:
                x = UpSample(chs[i], dtype=self.dtype)(x)
        x = nn.silu(_norm(x.shape[-1], self.dtype)(x))
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(
            x
        ).astype(jnp.float32)


@register("ldm_tpu.models.autoencoder.Autoencoder")
class Autoencoder(nn.Module):
    """VAE with quant/post-quant 1x1 convs (reference src/Autoencoder.py:383-462).

    ``__call__(img, key)`` returns ``(recon, mu, log_var)`` exactly like the
    reference's forward (src/Autoencoder.py:446-462), for the ELBO loss.
    """

    in_channels: int = 1
    z_channels: int = 512
    out_channels: int = 1
    channels: int = 64
    channel_multipliers: Sequence[int] = (1, 2, 4, 8)
    n_resnet_blocks: int = 2
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            channels=self.channels,
            channel_multipliers=self.channel_multipliers,
            n_resnet_blocks=self.n_resnet_blocks,
            z_channels=self.z_channels,
            dtype=self.dtype,
        )
        self.quant_conv = nn.Conv(2 * self.z_channels, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.z_channels, (1, 1), dtype=self.dtype)
        self.decoder = Decoder(
            channels=self.channels,
            channel_multipliers=self.channel_multipliers,
            n_resnet_blocks=self.n_resnet_blocks,
            out_channels=self.out_channels,
            dtype=self.dtype,
        )

    def encode_moments(self, img: Array) -> Array:
        """Image → (mu ‖ log_var) moments (reference ``encode``,
        src/Autoencoder.py:427-434), float32."""
        return self.quant_conv(self.encoder(img)).astype(jnp.float32)

    @staticmethod
    def moments_split(moments: Array) -> Tuple[Array, Array]:
        """Split moments into (mu, log_var) — channel chunk like
        ``torch.chunk(dim=1)`` (src/Autoencoder.py:30), last axis in NHWC."""
        return jnp.split(moments, 2, axis=-1)

    @staticmethod
    def sample_latent(moments: Array, key: Array) -> Array:
        """Reparameterized z = mu + sigma * eps (reference
        ``GaussianDistribution.sample``, src/Autoencoder.py:39-43)."""
        mu, log_var = Autoencoder.moments_split(moments)
        sigma = jnp.exp(0.5 * log_var)
        return mu + sigma * jax.random.normal(key, sigma.shape, sigma.dtype)

    def decode(self, z: Array) -> Array:
        """Latent → image (reference src/Autoencoder.py:436-444)."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, img: Array, key: Array) -> Tuple[Array, Array, Array]:
        moments = self.encode_moments(img)
        mu, log_var = self.moments_split(moments)
        z = self.sample_latent(moments, key)
        return self.decode(z), mu, log_var
