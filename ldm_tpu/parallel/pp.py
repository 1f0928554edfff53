"""Pipeline parallelism (PP): GPipe-style microbatched UNet over ``model``.

The reference is single-device with no distributed backend at all
(src/utils.py:133-141; SURVEY.md §2 parallelism note), so PP — like DP / FSDP /
TP / SP here — is a capability-plus component dictated by the TPU target, not a
port.  Where FSDP/TP/SP are *annotation* strategies (GSPMD infers the
collectives), PP is a *schedule*: devices hold disjoint contiguous chunks of
the model and microbatches stream through them, so it is written in the
explicit-SPMD dialect — ``shard_map`` over the mesh's ``model`` axis, a
``lax.scan`` over pipeline ticks, and ``lax.ppermute`` as the stage-to-stage
point-to-point (ICI neighbor traffic, the TPU-native send/recv).

Design:

* **Stages.** The UNet's skip topology admits ONE natural cut: everything a
  skip connection crosses must travel with the pipeline payload, so the cut
  sits at the bottleneck — stage 0 = conditioning + stem + encoder +
  bottleneck, stage 1 = decoder + head.  The payload is (h_mid, all L skips,
  t_emb) flat-packed into one fp32 vector.  The stage functions re-express
  ``UNet.__call__`` (models/unet.py) as pure functions over the SAME param
  subtrees — ``test_pp.py`` pins staged == whole-model output exactly, so the
  two cannot drift silently.
* **Schedule.** GPipe: the batch splits into M microbatches; tick s runs
  stage d on microbatch s-d, then ``ppermute`` shifts payloads to d+1.
  M+K-1 ticks, bubble fraction (K-1)/(M+K-1).  Each device executes ONE
  ``lax.switch`` branch per tick (its own stage) — the program is SPMD but
  the work is MPMD.
* **Param placement.** Each stage's param subtree is flattened to one fp32
  vector, zero-padded to the max stage size, and stacked to (K, Pmax) sharded
  ``P("model")`` — each device materializes ONLY its stage's weights (the
  memory point of PP).  Inside the per-device program the local row is
  unflattened back to the stage's tree via a static template.  Optimizers run
  directly on the stacked array (Adam is elementwise; padding stays zero).
* **Composition.** The ``data`` axis passes straight through: every data-row
  of the mesh runs an independent pipeline on its batch shard and the loss
  psum rides the existing DP path — DP x PP on one (data, model) mesh.
* **AD.** ``jax.grad`` through the scan transposes the schedule for free:
  ``ppermute``'s transpose is the reverse permutation, so the backward pass
  is the reverse pipeline (full-stash GPipe; wrap stages in ``jax.checkpoint``
  at scale).  tests/test_pp.py pins pipeline grads == single-device grads.

K is the mesh's ``model`` size and must equal 2 for the UNet (the machinery
below — payload ring, switch-of-stages, stacked params — is K-generic; only
the UNet split is 2-stage by topology).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ldm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

Array = jax.Array


# --------------------------------------------------------------------- packing
def tree_size(tree: Any) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def pack_tree(tree: Any) -> Array:
    """Flatten every leaf (canonical jax.tree order) into one fp32 vector."""
    leaves = jax.tree.leaves(tree)
    return jnp.concatenate([x.reshape(-1).astype(jnp.float32) for x in leaves])


def unpack_tree(vec: Array, template: Any) -> Any:
    """Inverse of :func:`pack_tree` given a ShapeDtypeStruct template tree."""
    structs, treedef = jax.tree.flatten(template)
    leaves, off = [], 0
    for s in structs:
        n = int(np.prod(s.shape))
        leaves.append(vec[off:off + n].reshape(s.shape).astype(s.dtype))
        off += n
    return jax.tree.unflatten(treedef, leaves)


# ----------------------------------------------------------------- UNet stages
def _chs(model) -> List[int]:
    return [model.channels] + [model.channels * m for m in model.channel_multipliers]


def split_unet_params(model, params: Any) -> Tuple[dict, dict]:
    """Partition the UNet param dict at the bottleneck/decoder cut.

    Stage 0: TimeEmbedding_0, Embed_0, Conv_0 (stem), encoder
    ResNetBlock_0..L-1 / LinAttnBlock_0..L-1, bottleneck ResNetBlock_L,
    PreNormResidual_0 + Attention_0, ResNetBlock_{L+1}.
    Stage 1: ConvTranspose_0..L-1, decoder ResNetBlock_{L+2}.. /
    LinAttnBlock_L.., head ResNetBlock_{2L+2}, Conv_1.
    """
    p = params["params"] if "params" in params else params
    L = len(model.channel_multipliers)
    s0 = {"Conv_0", "PreNormResidual_0", "Attention_0"}
    if model.with_time_emb:
        s0.add("TimeEmbedding_0")
    if "Embed_0" in p:
        s0.add("Embed_0")
    s0 |= {f"ResNetBlock_{i}" for i in range(L + 2)}
    s0 |= {f"LinAttnBlock_{i}" for i in range(L)}
    p0 = {k: v for k, v in p.items() if k in s0}
    p1 = {k: v for k, v in p.items() if k not in s0}
    # every complement key must be a KNOWN decoder/head module — an
    # unanticipated key would otherwise ride stage 1 dead (zero grads)
    unknown = {
        k for k in p1
        if not (k == "Conv_1"
                or k.startswith(("ConvTranspose_", "ResNetBlock_",
                                 "LinAttnBlock_")))
    }
    assert not unknown, f"unexpected UNet param keys for the PP split: {unknown}"
    return p0, p1


def unet_stage0(model, p0: dict, x: Array, t: Array,
                y: Optional[Array]) -> Tuple[Array, List[Array], Array]:
    """Conditioning + stem + encoder + bottleneck (models/unet.py __call__
    up to the decoder; reference src/UNet.py:167-209, 276-290)."""
    from ldm_tpu.models.unet import (
        Attention, LinAttnBlock, ResNetBlock, TimeEmbedding,
    )

    dt = model.dtype
    chs = _chs(model)
    d_time = model.channels * 4
    assert model.with_time_emb, "PP stage split assumes the conditional UNet"
    t_emb = TimeEmbedding(d_time, dtype=dt).apply(
        {"params": p0["TimeEmbedding_0"]}, t)
    if model.num_classes is not None and y is not None:
        table = nn.Embed(model.num_classes, d_time, dtype=dt)
        is_null = y >= model.num_classes
        safe_y = jnp.where(is_null, 0, y)
        lab = table.apply({"params": p0["Embed_0"]}, safe_y)
        t_emb = t_emb + lab * (1.0 - is_null.astype(dt))[:, None]

    x = x.astype(dt)
    x = nn.Conv(model.channels, (3, 3), padding=1, dtype=dt).apply(
        {"params": p0["Conv_0"]}, x)
    skips: List[Array] = []
    for i, dim_out in enumerate(chs[1:]):
        x = ResNetBlock(dim_out, dtype=dt).apply(
            {"params": p0[f"ResNetBlock_{i}"]}, x, t_emb)
        x = LinAttnBlock(dtype=dt, impl=model.attention_impl).apply(
            {"params": p0[f"LinAttnBlock_{i}"]}, x)
        skips.append(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))

    L = len(chs) - 1
    bt = t_emb if model.bottleneck_time_emb else None
    x = ResNetBlock(chs[-1], dtype=dt).apply(
        {"params": p0[f"ResNetBlock_{L}"]}, x, bt)
    # PreNormResidual(Attention): the wrapped module's params live at the
    # top level (Attention_0) because it is passed as a field (unet.py:368)
    h = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=dt).apply(
        {"params": p0["PreNormResidual_0"]["GroupNorm_0"]}, x)
    x = x + Attention(dtype=dt).apply({"params": p0["Attention_0"]}, h)
    x = ResNetBlock(chs[-1], dtype=dt).apply(
        {"params": p0[f"ResNetBlock_{L + 1}"]}, x, bt)
    return x, skips, t_emb


def unet_stage1(model, p1: dict, x: Array, skips: Sequence[Array],
                t_emb: Array) -> Array:
    """Decoder + head (models/unet.py __call__ from the decoder; reference
    src/UNet.py:212-248, 345-348)."""
    from ldm_tpu.models.unet import LinAttnBlock, ResNetBlock

    dt = model.dtype
    chs = _chs(model)
    L = len(chs) - 1
    skips = list(skips)
    x = x.astype(dt)
    t_emb = t_emb.astype(dt)
    for j, dim_out in enumerate(list(reversed(chs[1:-1])) + [chs[0]]):
        x = nn.ConvTranspose(
            dim_out, (2, 2), strides=(2, 2), padding="VALID", dtype=dt
        ).apply({"params": p1[f"ConvTranspose_{j}"]}, x)
        x = jnp.concatenate([x, skips.pop()], axis=-1)
        x = ResNetBlock(dim_out, dtype=dt).apply(
            {"params": p1[f"ResNetBlock_{L + 2 + j}"]}, x, t_emb)
        x = LinAttnBlock(dtype=dt, impl=model.attention_impl).apply(
            {"params": p1[f"LinAttnBlock_{L + j}"]}, x)
    x = ResNetBlock(model.channels, dtype=dt).apply(
        {"params": p1[f"ResNetBlock_{2 * L + 2}"]}, x)
    x = nn.Conv(model.out_channels, (1, 1), dtype=dt).apply(
        {"params": p1["Conv_1"]}, x)
    return x.astype(jnp.float32)


def unet_staged_apply(model, params: Any, x: Array, t: Array,
                      y: Optional[Array]) -> Array:
    """stage1(stage0(...)) on one device — the parity anchor for the split."""
    p0, p1 = split_unet_params(model, params)
    return unet_stage1(model, p1, *unet_stage0(model, p0, x, t, y))


# ------------------------------------------------------------- stacked params
class PPParams:
    """Stage-sharded UNet parameters + the static metadata to use them.

    ``stacked`` is the (K, Pmax) fp32 array (zero-padded rows), intended to be
    placed with :func:`stage_sharding` — each device holds only its stage.
    ``templates`` are per-stage ShapeDtypeStruct trees for unflattening.
    """

    def __init__(self, stacked: Array, templates: List[Any], model):
        self.stacked = stacked
        self.templates = templates
        self.model = model

    @property
    def n_stages(self) -> int:
        return len(self.templates)

    def stage_trees(self) -> List[Any]:
        """Unpack back to per-stage param dicts (host-side/debug)."""
        return [unpack_tree(self.stacked[k], tpl)
                for k, tpl in enumerate(self.templates)]


def stage_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(MODEL_AXIS))


def pp_pack_params(mesh: Optional[Mesh], model, params: Any) -> PPParams:
    """Flat-pack + stack the UNet params for a 2-stage pipeline and (when a
    mesh is given) place the stack sharded over the ``model`` axis."""
    trees = split_unet_params(model, params)
    templates = [jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), t) for t in trees]
    pmax = max(tree_size(t) for t in trees)
    rows = [jnp.pad(pack_tree(t), (0, pmax - tree_size(t))) for t in trees]
    stacked = jnp.stack(rows)
    if mesh is not None:
        stacked = jax.device_put(stacked, stage_sharding(mesh))
    return PPParams(stacked, templates, model)


# ------------------------------------------------------------------- pipeline
def _payload_template(model, mb_shape: Tuple[int, ...]) -> Any:
    """ShapeDtypeStructs of (h_mid, skips..., t_emb) for a microbatch shape."""
    b = mb_shape[0]
    # shapes follow from the architecture alone; compute them directly
    chs = _chs(model)
    hh, ww = mb_shape[1], mb_shape[2]
    skips = []
    h, w = hh, ww
    for c in chs[1:]:
        skips.append(jax.ShapeDtypeStruct((b, h, w, c), model.dtype))
        h, w = h // 2, w // 2
    mid = jax.ShapeDtypeStruct((b, h, w, chs[-1]), model.dtype)
    temb = jax.ShapeDtypeStruct((b, model.channels * 4), model.dtype)
    return (mid, tuple(skips), temb)


def pipeline_unet_apply(
    mesh: Mesh,
    pp: PPParams,
    x: Array,
    t: Array,
    y: Array,
    n_microbatches: int,
) -> Array:
    """The pipelined equivalent of ``model.apply(params, x, t, y)``.

    Jittable; call under ``jax.jit`` (or take grads of a loss built on it —
    the backward schedule is the transposed pipeline).  The global batch must
    divide by n_microbatches x the mesh's data-axis size.
    """
    model = pp.model
    K = int(mesh.shape[MODEL_AXIS])
    assert K == pp.n_stages == 2, (
        f"UNet pipeline is 2-stage; mesh model axis is {K}")
    M = int(n_microbatches)
    B = x.shape[0]
    assert B % M == 0, f"batch {B} not divisible into {M} microbatches"
    bmb = B // M
    ndata = int(mesh.shape[DATA_AXIS])
    assert bmb % ndata == 0, f"microbatch {bmb} not divisible over data={ndata}"

    xm = x.reshape((M, bmb) + x.shape[1:])
    tm = t.reshape(M, bmb)
    ym = y.reshape(M, bmb)

    mb_local = (bmb // ndata,) + x.shape[1:]
    payload_tpl = _payload_template(model, mb_local)
    psize = tree_size(payload_tpl)
    out_local = jax.ShapeDtypeStruct(mb_local[:-1] + (model.out_channels,),
                                     jnp.float32)

    def device_fn(stacked_local, xm, tm, ym):
        # stacked_local: (1, Pmax) — this device's stage weights
        d = jax.lax.axis_index(MODEL_AXIS)
        vec = stacked_local[0]
        # every pipeline value is device-varying over BOTH axes (each data
        # row runs its own pipeline; each model rank holds its own stage) —
        # constant-zero branch outputs must say so explicitly or shard_map's
        # varying-manual-axes check rejects the switch/scan
        axes = (DATA_AXIS, MODEL_AXIS)

        def _zeros(shape, dtype=jnp.float32):
            return jax.lax.pcast(jnp.zeros(shape, dtype), axes, to="varying")

        def tick(carry, s):
            buf, out = carry

            def run0(_):
                i = jnp.clip(s, 0, M - 1)
                xi = jax.lax.dynamic_index_in_dim(xm, i, 0, keepdims=False)
                ti = jax.lax.dynamic_index_in_dim(tm, i, 0, keepdims=False)
                yi = jax.lax.dynamic_index_in_dim(ym, i, 0, keepdims=False)
                p0 = unpack_tree(vec, pp.templates[0])
                mid, skips, temb = unet_stage0(model, p0, xi, ti, yi)
                payload = pack_tree((mid, tuple(skips), temb))
                return payload, _zeros(out_local.shape, out_local.dtype)

            def run1(_):
                p1 = unpack_tree(vec, pp.templates[1])
                mid, skips, temb = unpack_tree(buf, payload_tpl)
                eps = unet_stage1(model, p1, mid, skips, temb)
                return _zeros((psize,)), eps

            payload, eps = jax.lax.switch(jnp.minimum(d, 1), [run0, run1],
                                          None)
            # shift payloads one stage down the ring (device 0 receives
            # zeros — it never reads its buf)
            buf = jax.lax.ppermute(
                payload, MODEL_AXIS, [(k, k + 1) for k in range(K - 1)])
            # stage K-1 lands microbatch j = s-(K-1); early ticks (j<0) write
            # garbage at clip()=0 which tick s=K-1 overwrites (scan ascends)
            j = jnp.clip(s - (K - 1), 0, M - 1)
            out = jax.lax.dynamic_update_index_in_dim(out, eps, j, 0)
            return (buf, out), None

        buf0 = _zeros((psize,))
        out0 = _zeros((M,) + out_local.shape, out_local.dtype)
        (_, out), _ = jax.lax.scan(tick, (buf0, out0), jnp.arange(M + K - 1))
        # devices below the last stage contributed exact zeros
        return jax.lax.psum(out, MODEL_AXIS)

    fn = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(None, DATA_AXIS),
                  P(None, DATA_AXIS), P(None, DATA_AXIS)),
        out_specs=P(None, DATA_AXIS),
    )
    out = fn(pp.stacked, xm, tm, ym)
    return out.reshape((B,) + out.shape[2:])


def make_pp_apply(mesh: Mesh, pp: PPParams, n_microbatches: int):
    """Adapt the pipeline to the ``apply_fn(params, x, t, y)`` signature the
    samplers consume (diffusion/ddpm.py sample/sample_ddim) — ``params`` is
    the (K, Pmax) stage-sharded stack.  Each sampler scan step then streams
    its (2B fused-CFG) batch through the pipeline."""
    def apply_fn(stacked, x, t, y):
        return pipeline_unet_apply(
            mesh, PPParams(stacked, pp.templates, pp.model), x, t, y,
            n_microbatches)

    return apply_fn
