"""Import reference torch checkpoints into this framework.

The reference saves weights-only checkpoints via ``torch.save(model.state_dict())``
(reference src/EarlyStopping.py:56-63) and reloads them with ``load_model``
(reference src/utils.py:36-45).  A user migrating from the reference has a pile
of trained ``.pt`` files; these functions map such state_dicts onto this
framework's flax parameter trees so those models keep working — the same weight
correspondences that tests/test_torch_parity.py proves produce numerically
identical outputs (whole-model forward equality for all three families).

Everything here is **key-based**: it consumes a ``{state_dict key: array}``
mapping, so importing needs only the saved file, never the reference source.
Optional reference submodules (residual shortcuts, down/upsamples) are detected
by key presence.

Array layout conversions (torch -> flax, NHWC):

* ``Conv2d``            (O, I, kh, kw) -> (kh, kw, I, O)
* ``Linear``            (O, I)         -> (I, O)
* ``ConvTranspose2d``   (I, O, kh, kw) -> (kh, kw, I, O), spatially flipped
  (flax deposits unflipped kernels — verified numerically in the parity tests)
* 1x1 convs used as projections -> dense kernels (I, O)

Entry point for files: scripts/import_torch_checkpoint.py.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _np(v) -> np.ndarray:
    """Accept torch tensors or numpy arrays without importing torch."""
    if hasattr(v, "detach"):  # torch.Tensor
        v = v.detach().cpu().numpy()
    return np.asarray(v)


class StateDict:
    """A consuming view of a torch state_dict.

    Every mapped key is marked consumed; :meth:`finish` raises if anything
    (other than explicitly dropped keys) is left over, so a mismatched
    architecture fails loudly instead of silently importing half a model.
    """

    def __init__(self, sd: Dict[str, Any]):
        self._sd = {k: _np(v) for k, v in sd.items()}
        self._left = set(self._sd)

    def has(self, key: str) -> bool:
        return key in self._sd

    def take(self, key: str) -> np.ndarray:
        if key not in self._sd:
            raise KeyError(
                f"state_dict is missing {key!r} — wrong architecture/config? "
                f"({len(self._sd)} keys present)"
            )
        self._left.discard(key)
        return self._sd[key]

    def drop(self, key: str) -> None:
        """Mark a key as intentionally unused (e.g. BatchNorm bookkeeping)."""
        self._left.discard(key)

    def finish(self) -> None:
        if self._left:
            extra = sorted(self._left)[:8]
            raise ValueError(
                f"{len(self._left)} state_dict keys were not consumed by the "
                f"import (first few: {extra}) — architecture mismatch, or the "
                f"checkpoint is not what --kind says it is"
            )


# ----------------------------------------------------------- layout conversions
def conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    return w.T


def convT_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def dense_from_1x1(w: np.ndarray) -> np.ndarray:
    return w[:, :, 0, 0].T


def _conv(sd: StateDict, pre: str) -> dict:
    out = {"kernel": conv_kernel(sd.take(f"{pre}.weight"))}
    if sd.has(f"{pre}.bias"):
        out["bias"] = sd.take(f"{pre}.bias")
    return out


def _norm(sd: StateDict, pre: str) -> dict:
    return {"scale": sd.take(f"{pre}.weight"), "bias": sd.take(f"{pre}.bias")}


def _linear(sd: StateDict, pre: str) -> dict:
    out = {"kernel": linear_kernel(sd.take(f"{pre}.weight"))}
    if sd.has(f"{pre}.bias"):
        out["bias"] = sd.take(f"{pre}.bias")
    return out


# ------------------------------------------------------------------------ UNet
def _unet_resblock(sd: StateDict, pre: str, with_time: bool) -> dict:
    """ResNetBlock (reference src/UNet.py:61-99): two GroupNorm->SiLU->Conv
    Blocks, optional time MLP, optional 1x1 shortcut."""
    def block(b: str) -> dict:
        return {"GroupNorm_0": _norm(sd, f"{pre}.{b}.norm"),
                "Conv_0": _conv(sd, f"{pre}.{b}.conv2d")}

    out = {"Block_0": block("block1"), "Block_1": block("block2")}
    if sd.has(f"{pre}.mlp_t.1.weight"):
        if with_time:
            out["Dense_0"] = _linear(sd, f"{pre}.mlp_t.1")
        else:
            sd.drop(f"{pre}.mlp_t.1.weight")
            sd.drop(f"{pre}.mlp_t.1.bias")
    if sd.has(f"{pre}.shortcut.weight"):
        out["Conv_0"] = _conv(sd, f"{pre}.shortcut")
    return out


def _lin_attn(sd: StateDict, pre: str) -> dict:
    """Residual(PreNorm(LinearAttention)) (reference src/UNet.py:14-20,102-110,
    139-164) -> our fused LinAttnBlock parameter names."""
    return {
        "norm_pre_scale": sd.take(f"{pre}.fn.norm.weight"),
        "norm_pre_bias": sd.take(f"{pre}.fn.norm.bias"),
        "qkv_kernel": dense_from_1x1(sd.take(f"{pre}.fn.fn.to_qkv.weight")),
        "out_kernel": dense_from_1x1(sd.take(f"{pre}.fn.fn.to_out.0.weight")),
        "out_bias": sd.take(f"{pre}.fn.fn.to_out.0.bias"),
        "norm_post_scale": sd.take(f"{pre}.fn.fn.to_out.1.weight"),
        "norm_post_bias": sd.take(f"{pre}.fn.fn.to_out.1.bias"),
    }


def unet_params_from_state_dict(
    state_dict: Dict[str, Any], bottleneck_time_emb: bool = False
) -> dict:
    """Map a reference UNet state_dict (src/UNet.py:293-389) to our flax tree.

    ``bottleneck_time_emb``: the reference's BottleNeck *creates* time MLPs in
    its res blocks but never calls them (the src/UNet.py:287-290 bug), so those
    weights sit at random init in every reference checkpoint.  False (default)
    reproduces reference behavior exactly and drops them; True imports them
    into our fixed bottleneck (they are untrained — expect a small output
    change until fine-tuned).
    """
    sd = StateDict(state_dict)
    n_levels = 0
    while sd.has(f"encoder.downs.{n_levels}.0.block1.norm.weight"):
        n_levels += 1
    if n_levels == 0:
        raise ValueError("no encoder.downs.* keys — not a reference UNet "
                         "state_dict")

    p: dict = {
        "TimeEmbedding_0": {
            "Dense_0": _linear(sd, "time_emb.time_mlp.1"),
            "Dense_1": _linear(sd, "time_emb.time_mlp.3"),
        },
        "Conv_0": _conv(sd, "initial_conv"),
    }
    if sd.has("label_emb.weight"):
        p["Embed_0"] = {"embedding": sd.take("label_emb.weight")}

    for i in range(n_levels):
        p[f"ResNetBlock_{i}"] = _unet_resblock(
            sd, f"encoder.downs.{i}.0", with_time=True
        )
        p[f"LinAttnBlock_{i}"] = _lin_attn(sd, f"encoder.downs.{i}.1")

    p[f"ResNetBlock_{n_levels}"] = _unet_resblock(
        sd, "bottleneck.res1", with_time=bottleneck_time_emb
    )
    p["PreNormResidual_0"] = {
        "GroupNorm_0": _norm(sd, "bottleneck.attn.fn.norm"),
    }
    p["Attention_0"] = {
        "Dense_0": {"kernel": dense_from_1x1(
            sd.take("bottleneck.attn.fn.fn.to_qkv.weight"))},
        "Dense_1": {"kernel": dense_from_1x1(
            sd.take("bottleneck.attn.fn.fn.to_out.weight")),
            "bias": sd.take("bottleneck.attn.fn.fn.to_out.bias")},
    }
    p[f"ResNetBlock_{n_levels + 1}"] = _unet_resblock(
        sd, "bottleneck.res2", with_time=bottleneck_time_emb
    )

    for i in range(n_levels):
        p[f"ConvTranspose_{i}"] = {
            "kernel": convT_kernel(sd.take(f"decoder.ups.{i}.2.weight")),
            "bias": sd.take(f"decoder.ups.{i}.2.bias"),
        }
        p[f"ResNetBlock_{n_levels + 2 + i}"] = _unet_resblock(
            sd, f"decoder.ups.{i}.0", with_time=True
        )
        p[f"LinAttnBlock_{n_levels + i}"] = _lin_attn(sd, f"decoder.ups.{i}.1")

    p[f"ResNetBlock_{2 * n_levels + 2}"] = _unet_resblock(
        sd, "final_conv.0", with_time=False
    )
    p["Conv_1"] = _conv(sd, "final_conv.1")
    sd.finish()
    return {"params": p}


# ------------------------------------------------------------------------- VAE
def _vae_resblock(sd: StateDict, pre: str) -> dict:
    out = {
        "GroupNorm_0": _norm(sd, f"{pre}.norm1"),
        "Conv_0": _conv(sd, f"{pre}.conv1"),
        "GroupNorm_1": _norm(sd, f"{pre}.norm2"),
        "Conv_1": _conv(sd, f"{pre}.conv2"),
    }
    if sd.has(f"{pre}.nin_shortcut.weight"):
        out["Conv_2"] = _conv(sd, f"{pre}.nin_shortcut")
    return out


def _vae_attn(sd: StateDict, pre: str) -> dict:
    def dense(name: str) -> dict:
        return {"kernel": dense_from_1x1(sd.take(f"{pre}.{name}.weight")),
                "bias": sd.take(f"{pre}.{name}.bias")}

    return {
        "GroupNorm_0": _norm(sd, f"{pre}.norm"),
        "Dense_0": dense("q"), "Dense_1": dense("k"), "Dense_2": dense("v"),
        "Dense_3": dense("proj_out"),
    }


def autoencoder_params_from_state_dict(state_dict: Dict[str, Any]) -> dict:
    """Map a reference Autoencoder state_dict (src/Autoencoder.py:383-462)."""
    sd = StateDict(state_dict)
    n_levels = 0
    while sd.has(f"encoder.down.{n_levels}.block.0.norm1.weight"):
        n_levels += 1
    if n_levels == 0:
        raise ValueError("no encoder.down.* keys — not a reference "
                         "Autoencoder state_dict")

    ep: dict = {"Conv_0": _conv(sd, "encoder.conv_in")}
    rb = ds = 0
    for level in range(n_levels):
        b = 0
        while sd.has(f"encoder.down.{level}.block.{b}.norm1.weight"):
            ep[f"ResnetBlock_{rb}"] = _vae_resblock(
                sd, f"encoder.down.{level}.block.{b}")
            rb += 1
            b += 1
        if sd.has(f"encoder.down.{level}.downsample.conv.weight"):
            ep[f"DownSample_{ds}"] = {
                "Conv_0": _conv(sd, f"encoder.down.{level}.downsample.conv")}
            ds += 1
    ep[f"ResnetBlock_{rb}"] = _vae_resblock(sd, "encoder.mid.block_1")
    ep["AttnBlock_0"] = _vae_attn(sd, "encoder.mid.attn_1")
    ep[f"ResnetBlock_{rb + 1}"] = _vae_resblock(sd, "encoder.mid.block_2")
    ep["GroupNorm_0"] = _norm(sd, "encoder.norm_out")
    ep["Conv_1"] = _conv(sd, "encoder.conv_out")

    dp: dict = {"Conv_0": _conv(sd, "decoder.conv_in")}
    dp["ResnetBlock_0"] = _vae_resblock(sd, "decoder.mid.block_1")
    dp["AttnBlock_0"] = _vae_attn(sd, "decoder.mid.attn_1")
    dp["ResnetBlock_1"] = _vae_resblock(sd, "decoder.mid.block_2")
    rb, us = 2, 0
    # the reference Decoder.forward iterates reversed(self.up)
    # (src/Autoencoder.py:333-380), so level order flips here
    for level in reversed(range(n_levels)):
        b = 0
        while sd.has(f"decoder.up.{level}.block.{b}.norm1.weight"):
            dp[f"ResnetBlock_{rb}"] = _vae_resblock(
                sd, f"decoder.up.{level}.block.{b}")
            rb += 1
            b += 1
        if sd.has(f"decoder.up.{level}.upsample.conv.weight"):
            dp[f"UpSample_{us}"] = {
                "Conv_0": _conv(sd, f"decoder.up.{level}.upsample.conv")}
            us += 1
    dp["GroupNorm_0"] = _norm(sd, "decoder.norm_out")
    dp["Conv_1"] = _conv(sd, "decoder.conv_out")

    p = {
        "encoder": ep, "decoder": dp,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }
    sd.finish()
    return {"params": p}


# ------------------------------------------------------------------ classifier
def resnet_params_from_state_dict(
    state_dict: Dict[str, Any],
) -> Tuple[dict, dict]:
    """Map a reference ResNetBase state_dict (src/ResNetClassifier.py:152-243).

    Returns ``(variables, batch_stats)`` merged as
    ``{"params": ..., "batch_stats": ...}`` — BatchNorm running statistics are
    part of the trained model and must travel with the weights.
    """
    sd = StateDict(state_dict)
    if not sd.has("final_linear.weight"):
        raise ValueError("no final_linear.* keys — not a reference ResNetBase "
                         "state_dict")
    if sd.has("blocks.0.conv3.weight"):
        raise NotImplementedError(
            "BottleneckResidualBlock checkpoints are not supported by the "
            "importer (no reference config ever builds them)"
        )

    def bn(pre: str) -> Tuple[dict, dict]:
        sd.drop(f"{pre}.num_batches_tracked")
        return (
            {"scale": sd.take(f"{pre}.weight"), "bias": sd.take(f"{pre}.bias")},
            {"mean": sd.take(f"{pre}.running_mean"),
             "var": sd.take(f"{pre}.running_var")},
        )

    params: dict = {"Conv_0": _conv(sd, "conv")}
    p0, s0 = bn("bn")
    params["BatchNorm_0"] = p0
    stats: dict = {"BatchNorm_0": s0}

    i = 0
    while sd.has(f"blocks.{i}.conv1.weight"):
        bp: dict = {}
        bs: dict = {}
        k = 0
        if sd.has(f"blocks.{i}.shortcut.conv.weight"):
            bp[f"Conv_{k}"] = _conv(sd, f"blocks.{i}.shortcut.conv")
            bp[f"BatchNorm_{k}"], bs[f"BatchNorm_{k}"] = bn(
                f"blocks.{i}.shortcut.bn")
            k += 1
        bp[f"Conv_{k}"] = _conv(sd, f"blocks.{i}.conv1")
        bp[f"BatchNorm_{k}"], bs[f"BatchNorm_{k}"] = bn(f"blocks.{i}.bn1")
        bp[f"Conv_{k + 1}"] = _conv(sd, f"blocks.{i}.conv2")
        bp[f"BatchNorm_{k + 1}"], bs[f"BatchNorm_{k + 1}"] = bn(
            f"blocks.{i}.bn2")
        params[f"ResidualBlock_{i}"] = bp
        stats[f"ResidualBlock_{i}"] = bs
        i += 1

    params["Dense_0"] = _linear(sd, "final_linear")
    sd.finish()
    return {"params": params, "batch_stats": stats}


# -------------------------------------------------------------------- plumbing
def detect_kind(state_dict: Dict[str, Any]) -> str:
    keys = set(state_dict)
    if any(k.startswith("time_emb.") for k in keys):
        return "unet"
    if "quant_conv.weight" in keys:
        return "autoencoder"
    if "final_linear.weight" in keys:
        return "classifier"
    raise ValueError(
        "cannot detect checkpoint kind from keys (expected a reference UNet, "
        "Autoencoder, or ResNetBase state_dict)"
    )


def check_against_template(mapped: Any, template: Any) -> None:
    """Assert the mapped tree has exactly the template's structure and shapes.

    ``template`` is typically ``jax.eval_shape(model.init, ...)`` — this turns
    a config/checkpoint mismatch into a precise error instead of a downstream
    flax shape surprise.
    """
    import jax

    got = {jax.tree_util.keystr(k): v.shape
           for k, v in jax.tree_util.tree_flatten_with_path(mapped)[0]}
    want = {jax.tree_util.keystr(k): v.shape
            for k, v in jax.tree_util.tree_flatten_with_path(template)[0]}
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    if missing or extra:
        raise ValueError(
            f"imported tree != model tree: missing={missing[:6]} "
            f"extra={extra[:6]}"
        )
    bad = [k for k in want if tuple(got[k]) != tuple(want[k])]
    if bad:
        detail = {k: (got[k], want[k]) for k in bad[:6]}
        raise ValueError(f"shape mismatches (imported vs model): {detail}")
