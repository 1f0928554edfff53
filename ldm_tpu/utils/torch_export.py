"""Export this framework's weights as reference-compatible torch state_dicts.

The inverse of ldm_tpu/utils/torch_import.py: walk OUR flax parameter tree and
emit the exact ``{key: array}`` mapping that ``torch.load`` +
``module.load_state_dict(strict=True)`` of the reference classes accepts
(reference src/UNet.py:293-389, src/Autoencoder.py:383-462,
src/ResNetClassifier.py:152-243).  Lets a model trained here be validated or
deployed with any torch tooling built around the reference.

Strictness notes:

* The reference's BottleNeck res blocks *create* time-MLP parameters they never
  use (its src/UNet.py:287-290 bug), so a strict torch load requires those keys.
  When our model was built with ``bottleneck_time_emb: false`` (exact reference
  behavior) the tree has no such weights — zeros of the right shape are emitted.
* BatchNorm ``num_batches_tracked`` bookkeeping (absent from flax) is emitted
  as 0.

All outputs are numpy arrays; callers (scripts/export_torch_checkpoint.py)
convert with ``torch.from_numpy`` at save time.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ldm_tpu.utils.torch_import import StateDict  # reused for key accounting


def _np(v) -> np.ndarray:
    return np.asarray(v)


# ----------------------------------------------------------- layout conversions
def conv_weight(k: np.ndarray) -> np.ndarray:
    """flax conv kernel (kh, kw, I, O) -> torch Conv2d weight (O, I, kh, kw)."""
    return np.transpose(_np(k), (3, 2, 0, 1))


def linear_weight(k: np.ndarray) -> np.ndarray:
    return _np(k).T


def convT_weight(k: np.ndarray) -> np.ndarray:
    """flax (kh, kw, I, O) spatially-flipped -> torch ConvTranspose2d
    (I, O, kh, kw).  Exact inverse of torch_import.convT_kernel."""
    return np.ascontiguousarray(
        np.transpose(_np(k)[::-1, ::-1], (2, 3, 0, 1))
    )


def conv1x1_from_dense(k: np.ndarray) -> np.ndarray:
    """dense kernel (I, O) -> torch 1x1 Conv2d weight (O, I, 1, 1)."""
    return _np(k).T[:, :, None, None]


def _put_conv(out: dict, pre: str, p: dict) -> None:
    out[f"{pre}.weight"] = conv_weight(p["kernel"])
    if "bias" in p:
        out[f"{pre}.bias"] = _np(p["bias"])


def _put_norm(out: dict, pre: str, p: dict) -> None:
    out[f"{pre}.weight"] = _np(p["scale"])
    out[f"{pre}.bias"] = _np(p["bias"])


def _put_linear(out: dict, pre: str, p: dict) -> None:
    out[f"{pre}.weight"] = linear_weight(p["kernel"])
    if "bias" in p:
        out[f"{pre}.bias"] = _np(p["bias"])


# ------------------------------------------------------------------------ UNet
def _put_unet_resblock(out: dict, pre: str, p: dict, time_dim: int) -> None:
    def put_block(b: str, bp: dict) -> None:
        _put_norm(out, f"{pre}.{b}.norm", bp["GroupNorm_0"])
        _put_conv(out, f"{pre}.{b}.conv2d", bp["Conv_0"])

    put_block("block1", p["Block_0"])
    put_block("block2", p["Block_1"])
    out_ch = _np(p["Block_1"]["Conv_0"]["kernel"]).shape[-1]
    if "Dense_0" in p:
        _put_linear(out, f"{pre}.mlp_t.1", p["Dense_0"])
    else:
        # reference blocks built with time_emb_dim always own these params
        out[f"{pre}.mlp_t.1.weight"] = np.zeros((out_ch, time_dim), np.float32)
        out[f"{pre}.mlp_t.1.bias"] = np.zeros((out_ch,), np.float32)
    if "Conv_0" in p:
        _put_conv(out, f"{pre}.shortcut", p["Conv_0"])


def _put_lin_attn(out: dict, pre: str, p: dict) -> None:
    out[f"{pre}.fn.norm.weight"] = _np(p["norm_pre_scale"])
    out[f"{pre}.fn.norm.bias"] = _np(p["norm_pre_bias"])
    out[f"{pre}.fn.fn.to_qkv.weight"] = conv1x1_from_dense(p["qkv_kernel"])
    out[f"{pre}.fn.fn.to_out.0.weight"] = conv1x1_from_dense(p["out_kernel"])
    out[f"{pre}.fn.fn.to_out.0.bias"] = _np(p["out_bias"])
    out[f"{pre}.fn.fn.to_out.1.weight"] = _np(p["norm_post_scale"])
    out[f"{pre}.fn.fn.to_out.1.bias"] = _np(p["norm_post_bias"])


def unet_state_dict_from_params(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our UNet flax tree ({"params": ...} or bare) -> reference state_dict."""
    p = params.get("params", params)
    n_levels = 0
    while f"ConvTranspose_{n_levels}" in p:
        n_levels += 1
    if n_levels == 0:
        raise ValueError("no ConvTranspose_* keys — not a UNet parameter tree")
    time_dim = _np(p["TimeEmbedding_0"]["Dense_1"]["kernel"]).shape[-1]

    out: dict = {}
    _put_linear(out, "time_emb.time_mlp.1", p["TimeEmbedding_0"]["Dense_0"])
    _put_linear(out, "time_emb.time_mlp.3", p["TimeEmbedding_0"]["Dense_1"])
    if "Embed_0" in p:
        out["label_emb.weight"] = _np(p["Embed_0"]["embedding"])
    _put_conv(out, "initial_conv", p["Conv_0"])

    for i in range(n_levels):
        _put_unet_resblock(out, f"encoder.downs.{i}.0",
                           p[f"ResNetBlock_{i}"], time_dim)
        _put_lin_attn(out, f"encoder.downs.{i}.1", p[f"LinAttnBlock_{i}"])

    _put_unet_resblock(out, "bottleneck.res1",
                       p[f"ResNetBlock_{n_levels}"], time_dim)
    _put_norm(out, "bottleneck.attn.fn.norm",
              p["PreNormResidual_0"]["GroupNorm_0"])
    out["bottleneck.attn.fn.fn.to_qkv.weight"] = conv1x1_from_dense(
        p["Attention_0"]["Dense_0"]["kernel"])
    out["bottleneck.attn.fn.fn.to_out.weight"] = conv1x1_from_dense(
        p["Attention_0"]["Dense_1"]["kernel"])
    out["bottleneck.attn.fn.fn.to_out.bias"] = _np(
        p["Attention_0"]["Dense_1"]["bias"])
    _put_unet_resblock(out, "bottleneck.res2",
                       p[f"ResNetBlock_{n_levels + 1}"], time_dim)

    for i in range(n_levels):
        out[f"decoder.ups.{i}.2.weight"] = convT_weight(
            p[f"ConvTranspose_{i}"]["kernel"])
        out[f"decoder.ups.{i}.2.bias"] = _np(p[f"ConvTranspose_{i}"]["bias"])
        _put_unet_resblock(out, f"decoder.ups.{i}.0",
                           p[f"ResNetBlock_{n_levels + 2 + i}"], time_dim)
        _put_lin_attn(out, f"decoder.ups.{i}.1",
                      p[f"LinAttnBlock_{n_levels + i}"])

    _put_unet_resblock(out, "final_conv.0",
                       p[f"ResNetBlock_{2 * n_levels + 2}"], time_dim)
    # final head block carries no time MLP in the reference either
    del out["final_conv.0.mlp_t.1.weight"], out["final_conv.0.mlp_t.1.bias"]
    _put_conv(out, "final_conv.1", p["Conv_1"])
    return out


# ------------------------------------------------------------------------- VAE
def _put_vae_resblock(out: dict, pre: str, p: dict) -> None:
    _put_norm(out, f"{pre}.norm1", p["GroupNorm_0"])
    _put_conv(out, f"{pre}.conv1", p["Conv_0"])
    _put_norm(out, f"{pre}.norm2", p["GroupNorm_1"])
    _put_conv(out, f"{pre}.conv2", p["Conv_1"])
    if "Conv_2" in p:
        _put_conv(out, f"{pre}.nin_shortcut", p["Conv_2"])


def _put_vae_attn(out: dict, pre: str, p: dict) -> None:
    _put_norm(out, f"{pre}.norm", p["GroupNorm_0"])
    for name, dk in (("q", "Dense_0"), ("k", "Dense_1"),
                     ("v", "Dense_2"), ("proj_out", "Dense_3")):
        out[f"{pre}.{name}.weight"] = conv1x1_from_dense(p[dk]["kernel"])
        out[f"{pre}.{name}.bias"] = _np(p[dk]["bias"])


def autoencoder_state_dict_from_params(
    params: Dict[str, Any], n_resnet_blocks: int
) -> Dict[str, np.ndarray]:
    """Our Autoencoder flax tree -> reference state_dict.

    ``n_resnet_blocks`` is the config's blocks-per-resolution (the flat
    ResnetBlock_i numbering alone can't distinguish level boundaries).
    """
    p = params.get("params", params)
    ep, dp = p["encoder"], p["decoder"]
    n_ds = sum(1 for k in ep if k.startswith("DownSample_"))
    n_levels = n_ds + 1
    n_enc_rb = sum(1 for k in ep if k.startswith("ResnetBlock_"))
    if n_enc_rb != n_levels * n_resnet_blocks + 2:
        raise ValueError(
            f"encoder has {n_enc_rb} res blocks, expected "
            f"{n_levels}*{n_resnet_blocks}+2 — wrong n_resnet_blocks?"
        )

    out: dict = {}
    _put_conv(out, "encoder.conv_in", ep["Conv_0"])
    rb = ds = 0
    for level in range(n_levels):
        for b in range(n_resnet_blocks):
            _put_vae_resblock(out, f"encoder.down.{level}.block.{b}",
                              ep[f"ResnetBlock_{rb}"])
            rb += 1
        if level < n_levels - 1:
            _put_conv(out, f"encoder.down.{level}.downsample.conv",
                      ep[f"DownSample_{ds}"]["Conv_0"])
            ds += 1
    _put_vae_resblock(out, "encoder.mid.block_1", ep[f"ResnetBlock_{rb}"])
    _put_vae_attn(out, "encoder.mid.attn_1", ep["AttnBlock_0"])
    _put_vae_resblock(out, "encoder.mid.block_2", ep[f"ResnetBlock_{rb + 1}"])
    _put_norm(out, "encoder.norm_out", ep["GroupNorm_0"])
    _put_conv(out, "encoder.conv_out", ep["Conv_1"])

    _put_conv(out, "decoder.conv_in", dp["Conv_0"])
    _put_vae_resblock(out, "decoder.mid.block_1", dp["ResnetBlock_0"])
    _put_vae_attn(out, "decoder.mid.attn_1", dp["AttnBlock_0"])
    _put_vae_resblock(out, "decoder.mid.block_2", dp["ResnetBlock_1"])
    rb, us = 2, 0
    # our decoder numbering follows the reference's reversed(self.up) execution
    # order (src/Autoencoder.py:333-380): highest level index first
    for level in reversed(range(n_levels)):
        for b in range(n_resnet_blocks + 1):  # decoder levels have n+1 blocks
            _put_vae_resblock(out, f"decoder.up.{level}.block.{b}",
                              dp[f"ResnetBlock_{rb}"])
            rb += 1
        if level > 0:
            _put_conv(out, f"decoder.up.{level}.upsample.conv",
                      dp[f"UpSample_{us}"]["Conv_0"])
            us += 1
    _put_norm(out, "decoder.norm_out", dp["GroupNorm_0"])
    _put_conv(out, "decoder.conv_out", dp["Conv_1"])

    _put_conv(out, "quant_conv", p["quant_conv"])
    _put_conv(out, "post_quant_conv", p["post_quant_conv"])
    return out


# ------------------------------------------------------------------ classifier
def resnet_state_dict_from_params(
    variables: Dict[str, Any],
) -> Dict[str, np.ndarray]:
    """Our classifier variables ({"params", "batch_stats"}) -> reference
    state_dict, including running statistics and num_batches_tracked=0."""
    p, stats = variables["params"], variables["batch_stats"]

    out: dict = {}

    def put_bn(pre: str, bp: dict, bs: dict) -> None:
        out[f"{pre}.weight"] = _np(bp["scale"])
        out[f"{pre}.bias"] = _np(bp["bias"])
        out[f"{pre}.running_mean"] = _np(bs["mean"])
        out[f"{pre}.running_var"] = _np(bs["var"])
        out[f"{pre}.num_batches_tracked"] = np.zeros((), np.int64)

    _put_conv(out, "conv", p["Conv_0"])
    put_bn("bn", p["BatchNorm_0"], stats["BatchNorm_0"])

    i = 0
    while f"ResidualBlock_{i}" in p:
        bp, bs = p[f"ResidualBlock_{i}"], stats[f"ResidualBlock_{i}"]
        k = 0
        n_convs = sum(1 for key in bp if key.startswith("Conv_"))
        if n_convs == 3:  # shortcut projection present
            _put_conv(out, f"blocks.{i}.shortcut.conv", bp["Conv_0"])
            put_bn(f"blocks.{i}.shortcut.bn", bp["BatchNorm_0"],
                   bs["BatchNorm_0"])
            k = 1
        _put_conv(out, f"blocks.{i}.conv1", bp[f"Conv_{k}"])
        put_bn(f"blocks.{i}.bn1", bp[f"BatchNorm_{k}"], bs[f"BatchNorm_{k}"])
        _put_conv(out, f"blocks.{i}.conv2", bp[f"Conv_{k + 1}"])
        put_bn(f"blocks.{i}.bn2", bp[f"BatchNorm_{k + 1}"],
               bs[f"BatchNorm_{k + 1}"])
        i += 1

    _put_linear(out, "final_linear", p["Dense_0"])
    return out


def roundtrip_check(exported: Dict[str, np.ndarray],
                    original: Dict[str, Any]) -> None:
    """Assert an exported state_dict exactly reproduces the original one
    (key set and values) — used by the roundtrip tests."""
    sd = StateDict(original)
    for k, v in exported.items():
        np.testing.assert_array_equal(v, sd.take(k), err_msg=k)
    sd.finish()
