"""Image transforms.

Reference semantics (src/transforms.py):

* forward: resize → ToTensor (scale to [0,1]) → ``t*2 - 1`` to [-1, 1]
  (src/transforms.py:8-19);
* reverse: ``(t+1)/2`` → CHW→HWC → ``*255`` → uint8 → PIL (src/transforms.py:22-35);
* grayscale loader for synthetic ImageFolder data (src/transforms.py:47-55).

Here images are NHWC throughout; resizing is done ONCE at dataset load (not per
batch) with ``jax.image.resize`` bilinear — matching torchvision ``Resize``'s default
interpolation on the 28→32 MNIST upscale.
"""

from __future__ import annotations

import numpy as np


def scale_to_minus_one_one(images_uint8: np.ndarray) -> np.ndarray:
    """uint8 [0,255] → float32 [-1,1] (src/transforms.py:14-15)."""
    return (images_uint8.astype(np.float32) / 255.0) * 2.0 - 1.0


def scale_to_zero_one(images_uint8: np.ndarray) -> np.ndarray:
    """uint8 [0,255] → float32 [0,1] (for BCE-based ELBO autoencoder training)."""
    return images_uint8.astype(np.float32) / 255.0


def reverse_transform(images: np.ndarray) -> np.ndarray:
    """float [-1,1] NHWC → uint8 [0,255] NHWC (src/transforms.py:22-35)."""
    images = np.asarray(images)
    images = np.clip((images + 1.0) / 2.0, 0.0, 1.0) * 255.0
    return images.astype(np.uint8)


def resize_images(images: np.ndarray, size: int) -> np.ndarray:
    """Resize an NHWC uint8 batch to (size, size), bilinear, on host once.

    Replaces the per-sample torchvision ``Resize`` in the reference's transform
    pipeline (src/transforms.py:12) with a single batched resize at load time.
    """
    if images.shape[1] == size and images.shape[2] == size:
        return images
    import jax

    out = jax.image.resize(
        images.astype(np.float32),
        (images.shape[0], size, size, images.shape[3]),
        method="bilinear",
    )
    return np.clip(np.asarray(out), 0, 255).astype(np.uint8)


def to_grayscale(images_uint8: np.ndarray) -> np.ndarray:
    """RGB NHWC uint8 → single-channel, ITU-R 601 weights like torchvision
    ``Grayscale`` (reference src/transforms.py:47-55)."""
    if images_uint8.shape[-1] == 1:
        return images_uint8
    w = np.array([0.299, 0.587, 0.114], np.float32)
    g = (images_uint8.astype(np.float32) @ w)[..., None]
    return np.clip(g, 0, 255).astype(np.uint8)
