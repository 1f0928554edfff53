"""Tensor parallelism (Megatron-style) over the mesh's ``model`` axis.

The UNet's attention blocks are the TP-friendly sites: their hidden width is
heads x dim_head, and the per-head computation (q/k softmaxes, the
block-diagonal context contraction) touches no cross-head state until the
output projection. The classic Megatron split therefore applies verbatim:

* qkv projection kernels — ``(C, 3H)``, sharded on the OUTPUT dim: each
  model-rank computes its own head group end to end;
* output projection kernels — ``(H, C)``, sharded on the INPUT dim: each
  rank contributes a partial product and GSPMD inserts ONE all-reduce per
  attention block (the only TP communication on the forward path);
* everything else (convs, norms, embeddings, biases) replicated over the
  ``model`` axis — the conv trunk's GroupNorms normalize over full channel
  groups, so channel-sharding them buys collectives without saving meaningful
  memory at these widths.

The annotations are the whole implementation: the same jitted train step
serves DP, FSDP, and TP; XLA GSPMD derives the partitioned program from the
parameter shardings. Combine with ``data`` for 2D (batch, heads) meshes via
``create_mesh(model=k)``.

NOTE: the fused Pallas attention kernel is a custom call GSPMD cannot
partition over heads, and the lane-native XLA form hides the head structure
in a (hidden, hidden) block-diagonal mask — measured on a (data=4, model=2)
CPU mesh it costs 31 collectives / 400.8 KiB per tiny-UNet forward
(perf/probe27.json). Trainers therefore force
``attention_impl="xla_heads"`` when the mesh has a model axis > 1: the
explicit-heads form keeps each rank's per-head pipeline local, leaving
exactly ONE activation all-reduce per attention site (5/5 measured) plus
kernel-slice-sized permutes — 15 collectives / 59.5 KiB on the same
forward. Single-axis (pure DP/FSDP) meshes keep the Pallas default.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ldm_tpu.parallel.mesh import MODEL_AXIS, replicated

# (key name, sharded dim semantics): qkv kernels shard their LAST dim
# (3H = stacked per-head columns), output projections their FIRST (H rows).
_QKV_KEYS = ("qkv_kernel", "Dense_0")   # LinAttnBlock / bottleneck Attention
_PROJ_KEYS = ("out_kernel", "Dense_1")  # their matching output projections


def _path_names(path) -> list:
    names = []
    for k in path:
        name = getattr(k, "key", None)
        if name is None:
            name = getattr(k, "name", None)
        if name is not None:
            names.append(str(name))
    return names


def tp_leaf_sharding(mesh: Mesh, path, x) -> NamedSharding:
    """Megatron split for one leaf, keyed by its tree path.  The bottleneck
    ``Attention`` module's Dense_0/Dense_1 kernels only count inside an
    ``Attention_*`` scope (ResNetBlocks also contain a ``Dense_0`` — the
    time-embedding projection, which stays replicated)."""
    n = mesh.shape[MODEL_AXIS]
    names = _path_names(path)
    shape = getattr(x, "shape", ())
    if n == 1 or len(shape) < 2 or names[-1] not in ("kernel",) + (
        "qkv_kernel", "out_kernel"
    ):
        return replicated(mesh)
    in_attention = any(s.startswith("Attention_") for s in names)
    leaf = names[-1]
    dense = names[-2] if len(names) >= 2 else ""
    is_qkv = leaf == _QKV_KEYS[0] or (in_attention and dense == _QKV_KEYS[1])
    is_proj = leaf == _PROJ_KEYS[0] or (in_attention and dense == _PROJ_KEYS[1])
    if is_qkv and shape[-1] % n == 0:
        return NamedSharding(mesh, P(*([None] * (len(shape) - 1)),
                                     MODEL_AXIS))
    if is_proj and shape[0] % n == 0:
        return NamedSharding(mesh, P(MODEL_AXIS,
                                     *([None] * (len(shape) - 1))))
    return replicated(mesh)


def tp_shardings(mesh: Mesh, tree: Any) -> Any:
    """Per-leaf TP sharding tree for params / a whole TrainState (the Adam
    moments and EMA mirror the param paths, so the same rule places them
    identically — the optimizer update stays elementwise-local)."""

    def rule(path, x):
        if hasattr(x, "dtype") and jax.numpy.issubdtype(
            x.dtype, jax.dtypes.prng_key
        ):
            return replicated(mesh)
        return tp_leaf_sharding(mesh, path, x)

    return jax.tree_util.tree_map_with_path(rule, tree)


def fsdp_tp_shardings(mesh: Mesh, tree: Any) -> Any:
    """2D composition: attention kernels TP-sharded over ``model``, every
    OTHER large leaf FSDP-sharded over ``data`` (parallel/fsdp.py rule) — the
    standard 2D recipe (ZeRO over the batch dimension of the mesh, tensor
    parallelism within it).  A TP-sharded leaf is not additionally sharded
    over data: its all-gather already rides the model axis, and double
    sharding would trade one collective for two on every use."""
    from ldm_tpu.parallel.fsdp import fsdp_leaf_sharding

    def rule(path, x):
        if hasattr(x, "dtype") and jax.numpy.issubdtype(
            x.dtype, jax.dtypes.prng_key
        ):
            return replicated(mesh)
        tp = tp_leaf_sharding(mesh, path, x)
        if tp != replicated(mesh):
            return tp
        return fsdp_leaf_sharding(mesh, x)

    return jax.tree_util.tree_map_with_path(rule, tree)
