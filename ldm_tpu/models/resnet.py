"""ResNet image classifier (flax, NHWC).

Rebuild of the reference ``ResNetBase`` (src/ResNetClassifier.py:152-243): 7x7
stride-2 stem conv + BatchNorm, stacked residual blocks (conv-BN-ReLU-conv-BN with a
1x1 ShortcutProjection when shape changes, src/ResNetClassifier.py:16-73) or
bottleneck blocks (1x1-3x3-1x1, src/ResNetClassifier.py:79-140), global average pool,
linear head.  Instantiated as ResNet-18 shape ``n_blocks=[2,2,2,2]``,
``n_channels=[64,128,256,512]`` by the experiment pipeline (main.py:75-87).

Deviation (PARITY.md): the reference applies Softmax in the model and then feeds the
result to ``F.cross_entropy`` — a double-softmax (src/ResNetClassifier.py:229,243 +
src/Trainer.py:64).  Here the model returns LOGITS and the trainer applies a proper
softmax-cross-entropy; ``apply(..., probs=True)`` gives probabilities for parity.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ldm_tpu.registry import register

Array = jax.Array
Dtype = Any


class ResidualBlock(nn.Module):
    """conv-BN-ReLU-conv-BN + projected shortcut (src/ResNetClassifier.py:31-73)."""

    out_channels: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        bn = lambda: nn.BatchNorm(use_running_average=not train, dtype=self.dtype)
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.out_channels:
            shortcut = nn.Conv(
                self.out_channels, (1, 1), strides=self.stride, dtype=self.dtype
            )(x)
            shortcut = bn()(shortcut)
        h = nn.Conv(
            self.out_channels, (3, 3), strides=self.stride, padding=1,
            use_bias=False, dtype=self.dtype,
        )(x)
        h = nn.relu(bn()(h))
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, use_bias=False, dtype=self.dtype
        )(h)
        h = bn()(h)
        return nn.relu(h + shortcut)


class BottleneckResidualBlock(nn.Module):
    """1x1 → 3x3 → 1x1 bottleneck block (src/ResNetClassifier.py:79-140)."""

    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        bn = lambda: nn.BatchNorm(use_running_average=not train, dtype=self.dtype)
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.out_channels:
            shortcut = nn.Conv(
                self.out_channels, (1, 1), strides=self.stride, dtype=self.dtype
            )(x)
            shortcut = bn()(shortcut)
        h = nn.relu(bn()(nn.Conv(
            self.bottleneck_channels, (1, 1), use_bias=False, dtype=self.dtype)(x)))
        h = nn.relu(bn()(nn.Conv(
            self.bottleneck_channels, (3, 3), strides=self.stride, padding=1,
            use_bias=False, dtype=self.dtype)(h)))
        h = bn()(nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype)(h))
        return nn.relu(h + shortcut)


@register("ldm_tpu.models.resnet.ResNetBase")
class ResNetBase(nn.Module):
    """Stacked residual blocks + linear head (src/ResNetClassifier.py:152-243)."""

    img_channels: int = 3
    out_channels: int = 10
    n_blocks: Sequence[int] = (2, 2, 2, 2)
    n_channels: Sequence[int] = (64, 128, 256, 512)
    bottlenecks: Optional[Sequence[int]] = None
    first_kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: Array, train: bool = False, probs: bool = False,
        features: bool = False,
    ) -> Array:
        assert len(self.n_blocks) == len(self.n_channels)
        x = x.astype(self.dtype)
        k = self.first_kernel_size
        x = nn.Conv(
            self.n_channels[0], (k, k), strides=2, padding=k // 2,
            use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)

        first = True
        for i, channels in enumerate(self.n_channels):
            # Reference quirk kept: only the VERY FIRST block in the whole stack gets
            # stride 2 (`stride = 2 if len(blocks) == 0 else 1`,
            # src/ResNetClassifier.py:198) — later stages change channels via the
            # projection shortcut without downsampling.
            stride = 2 if first else 1
            first = False
            for j in range(self.n_blocks[i]):
                s = stride if j == 0 else 1
                if self.bottlenecks is None:
                    x = ResidualBlock(channels, stride=s, dtype=self.dtype)(x, train)
                else:
                    x = BottleneckResidualBlock(
                        self.bottlenecks[i], channels, stride=s, dtype=self.dtype
                    )(x, train)

        x = x.mean(axis=(1, 2))  # global average pool (src/ResNetClassifier.py:237-241)
        if features:
            # penultimate embedding — used by ops.fid.classifier_fid
            return x.astype(jnp.float32)
        logits = nn.Dense(self.out_channels, dtype=self.dtype)(x).astype(jnp.float32)
        return jax.nn.softmax(logits, axis=-1) if probs else logits
