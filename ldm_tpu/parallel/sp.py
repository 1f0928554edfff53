"""Spatial partitioning (SP): shard activation HEIGHT over the ``model`` axis.

DP/FSDP/TP all leave each device holding FULL per-image activations — fine at
the reference's 32x32 (SURVEY.md §2 parallelism note: the reference itself is
single-device, src/utils.py:133-141), but the framework's own deployments run
high-resolution latent diffusion where ONE image's UNet activations outgrow a
chip's HBM (a 1024x1024x256 fp32 feature map is 1 GiB before the backward
pass).  Spatial partitioning is the TPU-native answer: shard the H dimension
of every (B, H, W, C) activation across the mesh's ``model`` axis and let
GSPMD's convolution partitioner insert the **halo exchanges** (each device
owns H/k rows and ppermutes the 1-row borders its 3x3 convs need — ICI
traffic proportional to the CUT, not the volume).

Design (the annotation IS the implementation, as with fsdp.py/tp.py):

* one ``with_sharding_constraint`` on the sampler's x_t at every scan step —
  GSPMD propagates the spatial sharding through the conv trunk from there,
  inserting halo exchanges (an EXACT decomposition of the convolution);
* params stay whatever ``param_sharding`` says (SP composes with replicated /
  fsdp — it is an ACTIVATION placement, orthogonal to parameter placement);
* attention sites flatten (H, W) -> N, which merges a sharded dim: GSPMD
  gathers H there and re-scatters after — acceptable at the reference's
  spatial sizes, and exactly the seam a production deployment would tune
  (e.g. ring attention over the same axis) if attention dominated;
* the deepest UNet level must keep >= 1 row per device: the divisibility
  guard keeps indivisible heights replicated rather than forcing GSPMD into
  degenerate 0-row shards.

**This annotation path serves FORWARD (inference/sampling) programs.**
Measured on this jaxlib (perf/probe28_RESULTS.md): forward numerics are exact
everywhere (full-UNet elementwise diff ~1e-6; every bisected op exact), but
GSPMD's partitioned TRANSPOSE of the composed UNet program corrupts gradients
(66-73/120 grad leaves wrong; bottleneck-block grads come out exactly
data-axis-times the reference — a dropped/duplicated all-reduce; minimal
trigger committed in perf/probe28c).  Gradient programs (train/eval) instead
run the EXPLICIT shard_map path — parallel/sp_explicit.py: hand-placed
ppermute halos, psum GroupNorm statistics, gathered attention — whose AD
transposes are exact by construction, so ``activation_sharding: spatial``
TRAINS.  tests/test_sp.py carries the canary that flips when a jaxlib
upgrade fixes the annotation path's transpose.

Usage: ``create_mesh(model=k)`` + ``activation_sharding: spatial`` in the
config (config.py): the sampler re-pins x_t here each scan step; the
trainers route gradient programs through sp_explicit.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ldm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def spatial_axis_size(mesh: Optional[Mesh]) -> int:
    if mesh is None:
        return 1
    return int(mesh.shape.get(MODEL_AXIS, 1))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C): batch over ``data``, rows over ``model``."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None, None))


def constrain_spatial(mesh: Optional[Mesh], x: jax.Array) -> jax.Array:
    """Pin a NHWC activation to the spatial sharding (no-op off-mesh, on
    model=1 meshes, for non-4D values, and when H has fewer rows than the
    axis — the bottleneck guard)."""
    k = spatial_axis_size(mesh)
    if k == 1 or x.ndim != 4 or x.shape[1] % k != 0:
        return x
    return jax.lax.with_sharding_constraint(x, spatial_sharding(mesh))


def wrap_apply_spatial(mesh: Optional[Mesh], apply_fn: Callable) -> Callable:
    """Wrap a flax ``model.apply`` so every call re-pins its input activation
    — the sampler hook: inside the T-step ``lax.scan`` each iteration's x_t
    comes back from the previous step already spatially sharded, and the
    constraint keeps GSPMD from drifting the placement across steps."""
    if spatial_axis_size(mesh) == 1:
        return apply_fn

    def apply(params, x, *args, **kwargs):
        return apply_fn(params, constrain_spatial(mesh, x), *args, **kwargs)

    return apply
