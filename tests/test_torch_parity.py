"""Golden-value parity tests against the ACTUAL reference implementation.

The reference PyTorch code is imported from /root/reference (executed for
comparison — never copied) and driven with the SAME weights as our flax modules:
torch weights are generated, mapped into the flax parameter layout (OIHW -> HWIO
convs, transposed linears, NCHW -> NHWC activations), and outputs are compared
numerically.  This pins down "bit-for-intent" parity (SURVEY.md §7) far harder
than shape tests.

Intentional deviations (PARITY.md) are NOT tested here — the bottleneck time-
embedding fix (#6) and the classifier logits change (#8) make whole-model equality
impossible by design; parity is proven block by block instead.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
ref_unet = pytest.importorskip("src.UNet")
ref_ddpm = pytest.importorskip("src.DDPM")

from ldm_tpu.models import unet as our_unet  # noqa: E402
from ldm_tpu.diffusion.ddpm import GaussianDiffusion  # noqa: E402

ATOL = 2e-5


def t2n(t):
    return t.detach().cpu().numpy()


def nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def conv_kernel(tw):
    """torch Conv2d weight (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return np.transpose(t2n(tw), (2, 3, 1, 0))


def linear_kernel(tw):
    """torch Linear weight (O, I) -> flax (I, O)."""
    return t2n(tw).T


def rand_nchw(*shape, seed=0):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(*shape, generator=g)


# --------------------------------------------------------------------- blocks
def test_sinusoidal_pos_emb_matches():
    dim = 16
    t = torch.tensor([0.0, 1.0, 7.0, 399.0])
    want = t2n(ref_unet.SinusoidalPosEmb(dim)(t))
    got = our_unet.SinusoidalPosEmb(dim).apply({}, jnp.asarray(t2n(t)))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_time_embedding_matches():
    n_channels = 32
    ref = ref_unet.TimeEmbedding(n_channels)
    t = torch.tensor([0.0, 3.0, 250.0])
    want = t2n(ref(t))
    lin1, lin2 = ref.time_mlp[1], ref.time_mlp[3]
    params = {"params": {
        "Dense_0": {"kernel": linear_kernel(lin1.weight),
                    "bias": t2n(lin1.bias)},
        "Dense_1": {"kernel": linear_kernel(lin2.weight),
                    "bias": t2n(lin2.bias)},
    }}
    got = our_unet.TimeEmbedding(n_channels).apply(params, jnp.asarray(t2n(t)))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_conv_block_matches():
    """Block = GroupNorm -> SiLU -> 3x3 conv (reference src/UNet.py:47-58)."""
    dim, dim_out = 16, 24
    ref = ref_unet.Block(dim, dim_out)
    x = rand_nchw(2, dim, 8, 8)
    want = nchw_to_nhwc(t2n(ref(x)))
    params = {"params": {
        "GroupNorm_0": {"scale": t2n(ref.norm.weight), "bias": t2n(ref.norm.bias)},
        "Conv_0": {"kernel": conv_kernel(ref.conv2d.weight),
                   "bias": t2n(ref.conv2d.bias)},
    }}
    got = our_unet.Block(dim_out).apply(params, jnp.asarray(nchw_to_nhwc(t2n(x))))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_resnet_block_with_time_matches():
    """ResNetBlock: two Blocks + time-MLP injection + 1x1 shortcut
    (reference src/UNet.py:61-99)."""
    dim, dim_out, d_time = 16, 24, 12
    ref = ref_unet.ResNetBlock(dim, dim_out, time_emb_dim=d_time)
    x = rand_nchw(2, dim, 8, 8)
    temb = rand_nchw(2, d_time, seed=1)
    want = nchw_to_nhwc(t2n(ref(x, temb)))
    mlp_lin = ref.mlp_t[1]

    def block_params(b):
        return {
            "GroupNorm_0": {"scale": t2n(b.norm.weight), "bias": t2n(b.norm.bias)},
            "Conv_0": {"kernel": conv_kernel(b.conv2d.weight),
                       "bias": t2n(b.conv2d.bias)},
        }

    params = {"params": {
        "Block_0": block_params(ref.block1),
        "Block_1": block_params(ref.block2),
        "Dense_0": {"kernel": linear_kernel(mlp_lin.weight),
                    "bias": t2n(mlp_lin.bias)},
        "Conv_0": {"kernel": conv_kernel(ref.shortcut.weight),
                   "bias": t2n(ref.shortcut.bias)},
    }}
    got = our_unet.ResNetBlock(dim_out).apply(
        params, jnp.asarray(nchw_to_nhwc(t2n(x))), jnp.asarray(t2n(temb))
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def _lin_attn_block_params(ref_wrapped):
    """Map torch Residual(PreNorm(LinearAttention)) weights -> our LinAttnBlock."""
    prenorm = ref_wrapped.fn            # PreNorm
    attn = prenorm.fn                   # LinearAttention
    out_conv, out_gn = attn.to_out[0], attn.to_out[1]
    return {"params": {
        "norm_pre_scale": t2n(prenorm.norm.weight),
        "norm_pre_bias": t2n(prenorm.norm.bias),
        # 1x1 conv (O, I, 1, 1) -> dense (I, O)
        "qkv_kernel": t2n(attn.to_qkv.weight)[:, :, 0, 0].T,
        "out_kernel": t2n(out_conv.weight)[:, :, 0, 0].T,
        "out_bias": t2n(out_conv.bias),
        "norm_post_scale": t2n(out_gn.weight),
        "norm_post_bias": t2n(out_gn.bias),
    }}


def test_linear_attention_block_matches():
    """Residual(PreNorm(LinearAttention)) (reference src/UNet.py:139-164 wrapped
    per src/UNet.py:14-20,102-110) == our fused LinAttnBlock, same weights."""
    dim = 16
    ref = ref_unet.Residual(ref_unet.PreNorm(dim, ref_unet.LinearAttention(dim)))
    x = rand_nchw(2, dim, 8, 8)
    want = nchw_to_nhwc(t2n(ref(x)))
    got = our_unet.LinAttnBlock(impl="xla").apply(
        _lin_attn_block_params(ref), jnp.asarray(nchw_to_nhwc(t2n(x)))
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_full_attention_matches():
    """Bottleneck softmax Attention (reference src/UNet.py:113-136)."""
    dim = 16
    ref = ref_unet.Attention(dim)
    x = rand_nchw(2, dim, 4, 4)
    want = nchw_to_nhwc(t2n(ref(x)))
    params = {"params": {
        "Dense_0": {"kernel": t2n(ref.to_qkv.weight)[:, :, 0, 0].T},
        "Dense_1": {"kernel": t2n(ref.to_out.weight)[:, :, 0, 0].T,
                    "bias": t2n(ref.to_out.bias)},
    }}
    got = our_unet.Attention().apply(params, jnp.asarray(nchw_to_nhwc(t2n(x))))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


# ------------------------------------------------------------------ DDPM math
def test_q_sample_matches_reference():
    T = 50
    ref = ref_ddpm.Diffusion(n_steps=T, device=torch.device("cpu"))
    ours = GaussianDiffusion(n_steps=T)
    x0 = rand_nchw(4, 3, 8, 8)
    eps = rand_nchw(4, 3, 8, 8, seed=1)
    t = torch.tensor([0, 10, 25, 49])
    want = nchw_to_nhwc(t2n(ref.q_sample(x0, t, eps=eps)))
    got = ours.q_sample(
        jnp.asarray(nchw_to_nhwc(t2n(x0))), jnp.asarray(t2n(t)),
        jnp.asarray(nchw_to_nhwc(t2n(eps))),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_p_sample_mean_matches_reference():
    """p_sample with the fresh-noise term zeroed: compare the posterior mean path
    (the reference draws noise internally, src/DDPM.py:71-96, so equality is
    checked at t=0 where it adds none, and via the t>0 mean by subtracting the
    known sigma*z term is not possible — instead check t=0 exactly)."""
    T = 50
    ref = ref_ddpm.Diffusion(n_steps=T, device=torch.device("cpu"))
    ours = GaussianDiffusion(n_steps=T)
    xt = rand_nchw(4, 3, 8, 8)
    eps_theta = rand_nchw(4, 3, 8, 8, seed=2)
    t0 = torch.tensor([0, 0, 0, 0])
    want = nchw_to_nhwc(t2n(ref.p_sample(xt, t0, eps_theta)))
    got = ours.p_sample(
        jnp.asarray(nchw_to_nhwc(t2n(xt))), jnp.asarray(t2n(t0)),
        jnp.asarray(nchw_to_nhwc(t2n(eps_theta))),
        jnp.zeros((4, 8, 8, 3), jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_schedule_constants_match_reference():
    T = 400
    ref = ref_ddpm.Diffusion(n_steps=T, device=torch.device("cpu"))
    ours = GaussianDiffusion(n_steps=T)
    np.testing.assert_allclose(np.asarray(ours.schedule.betas), t2n(ref.beta),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(ours.schedule.alpha_bars),
                               t2n(ref.alpha_bar), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.schedule.sigma2), t2n(ref.sigma2),
                               atol=1e-7)


# ---------------------------------------------------------------- Autoencoder
ref_ae = pytest.importorskip("src.Autoencoder")
from ldm_tpu.models import autoencoder as our_ae  # noqa: E402


def test_vae_resnet_block_matches():
    """VAE ResnetBlock: norm-swish-conv x2 + nin shortcut, GroupNorm(32, 1e-6)
    (reference src/Autoencoder.py:46-84)."""
    cin, cout = 32, 64
    ref = ref_ae.ResnetBlock(cin, cout)
    x = rand_nchw(2, cin, 8, 8)
    want = nchw_to_nhwc(t2n(ref(x)))
    params = {"params": {
        "GroupNorm_0": {"scale": t2n(ref.norm1.weight), "bias": t2n(ref.norm1.bias)},
        "Conv_0": {"kernel": conv_kernel(ref.conv1.weight), "bias": t2n(ref.conv1.bias)},
        "GroupNorm_1": {"scale": t2n(ref.norm2.weight), "bias": t2n(ref.norm2.bias)},
        "Conv_1": {"kernel": conv_kernel(ref.conv2.weight), "bias": t2n(ref.conv2.bias)},
        "Conv_2": {"kernel": conv_kernel(ref.nin_shortcut.weight),
                   "bias": t2n(ref.nin_shortcut.bias)},
    }}
    got = our_ae.ResnetBlock(cout).apply(params, jnp.asarray(nchw_to_nhwc(t2n(x))))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_vae_attn_block_matches():
    """VAE single-head attention block (reference src/Autoencoder.py:87-139)."""
    c = 32
    ref = ref_ae.AttnBlock(c)
    x = rand_nchw(2, c, 4, 4)
    want = nchw_to_nhwc(t2n(ref(x)))

    def dense(conv):  # 1x1 conv -> dense
        return {"kernel": t2n(conv.weight)[:, :, 0, 0].T, "bias": t2n(conv.bias)}

    params = {"params": {
        "GroupNorm_0": {"scale": t2n(ref.norm.weight), "bias": t2n(ref.norm.bias)},
        "Dense_0": dense(ref.q), "Dense_1": dense(ref.k), "Dense_2": dense(ref.v),
        "Dense_3": dense(ref.proj_out),
    }}
    got = our_ae.AttnBlock().apply(params, jnp.asarray(nchw_to_nhwc(t2n(x))))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_vae_downsample_asymmetric_padding_matches():
    """Stride-2 conv with (0,1,0,1) zero pad (reference src/Autoencoder.py:160-180)."""
    c = 8
    ref = ref_ae.DownSample(c)
    x = rand_nchw(2, c, 9, 9)  # odd size exercises the asymmetric pad
    want = nchw_to_nhwc(t2n(ref(x)))
    params = {"params": {"Conv_0": {
        "kernel": conv_kernel(ref.conv.weight), "bias": t2n(ref.conv.bias)}}}
    got = our_ae.DownSample(c).apply(params, jnp.asarray(nchw_to_nhwc(t2n(x))))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_vae_upsample_matches():
    """Nearest 2x + 3x3 conv (reference src/Autoencoder.py:142-157)."""
    c = 8
    ref = ref_ae.UpSample(c)
    x = rand_nchw(2, c, 5, 5)
    want = nchw_to_nhwc(t2n(ref(x)))
    params = {"params": {"Conv_0": {
        "kernel": conv_kernel(ref.conv.weight), "bias": t2n(ref.conv.bias)}}}
    got = our_ae.UpSample(c).apply(params, jnp.asarray(nchw_to_nhwc(t2n(x))))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_gaussian_distribution_moments_match():
    """mu / sigma from the moments tensor (reference src/Autoencoder.py:21-43)."""
    moments = rand_nchw(2, 8, 4, 4)
    ref = ref_ae.GaussianDistribution(moments)
    mu, log_var = our_ae.Autoencoder.moments_split(
        jnp.asarray(nchw_to_nhwc(t2n(moments)))
    )
    np.testing.assert_allclose(np.asarray(mu), nchw_to_nhwc(t2n(ref.mu)), atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(jnp.exp(0.5 * log_var)), nchw_to_nhwc(t2n(ref.sigma)), atol=ATOL
    )


# ------------------------------------------------------------ ResNet classifier
ref_rn = pytest.importorskip("src.ResNetClassifier")
from ldm_tpu.models import resnet as our_rn  # noqa: E402


def _bn(torch_bn):
    return (
        {"scale": t2n(torch_bn.weight), "bias": t2n(torch_bn.bias)},
        {"mean": t2n(torch_bn.running_mean), "var": t2n(torch_bn.running_var)},
    )


def test_classifier_residual_block_matches_eval():
    """conv-BN-ReLU-conv-BN + ShortcutProjection, eval mode (running stats)
    (reference src/ResNetClassifier.py:16-73)."""
    cin, cout, stride = 8, 16, 2
    ref = ref_rn.ResidualBlock(cin, cout, stride).eval()
    # make running stats non-trivial
    with torch.no_grad():
        for bn in (ref.bn1, ref.bn2, ref.shortcut.bn):
            bn.running_mean.uniform_(-0.5, 0.5)
            bn.running_var.uniform_(0.5, 1.5)
    x = rand_nchw(2, cin, 8, 8)
    with torch.no_grad():
        want = nchw_to_nhwc(t2n(ref(x)))
    bn0p, bn0s = _bn(ref.shortcut.bn)
    bn1p, bn1s = _bn(ref.bn1)
    bn2p, bn2s = _bn(ref.bn2)
    variables = {
        "params": {
            "Conv_0": {"kernel": conv_kernel(ref.shortcut.conv.weight),
                       "bias": t2n(ref.shortcut.conv.bias)},
            "BatchNorm_0": bn0p,
            "Conv_1": {"kernel": conv_kernel(ref.conv1.weight)},
            "BatchNorm_1": bn1p,
            "Conv_2": {"kernel": conv_kernel(ref.conv2.weight)},
            "BatchNorm_2": bn2p,
        },
        "batch_stats": {
            "BatchNorm_0": bn0s, "BatchNorm_1": bn1s, "BatchNorm_2": bn2s,
        },
    }
    got = our_rn.ResidualBlock(cout, stride=stride).apply(
        variables, jnp.asarray(nchw_to_nhwc(t2n(x))), train=False
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


# ------------------------------------------------------------- whole-model UNet
def _map_unet_resblock(ref, with_time: bool) -> dict:
    def block_params(b):
        return {
            "GroupNorm_0": {"scale": t2n(b.norm.weight), "bias": t2n(b.norm.bias)},
            "Conv_0": {"kernel": conv_kernel(b.conv2d.weight),
                       "bias": t2n(b.conv2d.bias)},
        }

    out = {"Block_0": block_params(ref.block1), "Block_1": block_params(ref.block2)}
    if with_time and ref.mlp_t is not None:
        out["Dense_0"] = {"kernel": linear_kernel(ref.mlp_t[1].weight),
                          "bias": t2n(ref.mlp_t[1].bias)}
    if not isinstance(ref.shortcut, torch.nn.Identity):
        out["Conv_0"] = {"kernel": conv_kernel(ref.shortcut.weight),
                         "bias": t2n(ref.shortcut.bias)}
    return out


def _convT_kernel(tw):
    """torch ConvTranspose2d weight (in, out, kh, kw) -> flax (kh, kw, in, out),
    spatially flipped (verified numerically: flax deposits unflipped kernels)."""
    return np.ascontiguousarray(np.transpose(t2n(tw), (2, 3, 0, 1))[::-1, ::-1])


def test_whole_unet_matches_reference():
    """FULL UNet forward parity: identical weights, identical output, including
    the decoder channel ladder, skip wiring, maxpool/convT placement, and the
    conditioning path.  Uses bottleneck_time_emb=False to reproduce the
    reference's time-emb drop (its BottleNeck bug, src/UNet.py:287-290); our
    default fixes it (PARITY.md #6)."""
    ch, mults, nc = 16, (1, 2), 10
    ref = ref_unet.UNet(in_channels=1, out_channels=1, channels=ch,
                        channel_multipliers=list(mults), num_classes=nc).eval()
    ours = our_unet.UNet(in_channels=1, out_channels=1, channels=ch,
                         channel_multipliers=mults, num_classes=nc,
                         bottleneck_time_emb=False)

    p = {
        "TimeEmbedding_0": {
            "Dense_0": {"kernel": linear_kernel(ref.time_emb.time_mlp[1].weight),
                        "bias": t2n(ref.time_emb.time_mlp[1].bias)},
            "Dense_1": {"kernel": linear_kernel(ref.time_emb.time_mlp[3].weight),
                        "bias": t2n(ref.time_emb.time_mlp[3].bias)},
        },
        "Embed_0": {"embedding": t2n(ref.label_emb.weight)},
        "Conv_0": {"kernel": conv_kernel(ref.initial_conv.weight),
                   "bias": t2n(ref.initial_conv.bias)},
    }
    n_levels = len(mults)
    # encoder: ResNetBlock_i + LinAttnBlock_i per level
    for i, (block, attn, _pool) in enumerate(ref.encoder.downs):
        p[f"ResNetBlock_{i}"] = _map_unet_resblock(block, with_time=True)
        p[f"LinAttnBlock_{i}"] = _lin_attn_block_params(attn)["params"]
    # bottleneck: ResNetBlock_{n}, PreNormResidual_0(Attention), ResNetBlock_{n+1}
    p[f"ResNetBlock_{n_levels}"] = _map_unet_resblock(
        ref.bottleneck.res1, with_time=False
    )
    bn_attn = ref.bottleneck.attn.fn  # Residual -> PreNorm
    p["PreNormResidual_0"] = {
        "GroupNorm_0": {"scale": t2n(bn_attn.norm.weight),
                        "bias": t2n(bn_attn.norm.bias)},
    }
    # the Attention module is constructed in UNet's scope, so flax registers its
    # params at the top level (not under PreNormResidual_0)
    p["Attention_0"] = {
        "Dense_0": {"kernel": t2n(bn_attn.fn.to_qkv.weight)[:, :, 0, 0].T},
        "Dense_1": {"kernel": t2n(bn_attn.fn.to_out.weight)[:, :, 0, 0].T,
                    "bias": t2n(bn_attn.fn.to_out.bias)},
    }
    p[f"ResNetBlock_{n_levels + 1}"] = _map_unet_resblock(
        ref.bottleneck.res2, with_time=False
    )
    # decoder: ConvTranspose_i + ResNetBlock_{n+2+i} + LinAttnBlock_{n+i}
    for i, (block, attn, convT) in enumerate(ref.decoder.ups):
        p[f"ConvTranspose_{i}"] = {"kernel": _convT_kernel(convT.weight),
                                   "bias": t2n(convT.bias)}
        p[f"ResNetBlock_{n_levels + 2 + i}"] = _map_unet_resblock(
            block, with_time=True
        )
        p[f"LinAttnBlock_{n_levels + i}"] = _lin_attn_block_params(attn)["params"]
    # head: ResNetBlock (no time) + 1x1 conv
    p[f"ResNetBlock_{2 * n_levels + 2}"] = _map_unet_resblock(
        ref.final_conv[0], with_time=False
    )
    p["Conv_1"] = {"kernel": conv_kernel(ref.final_conv[1].weight),
                   "bias": t2n(ref.final_conv[1].bias)}

    x = rand_nchw(2, 1, 16, 16)
    t = torch.tensor([3, 250])
    y = torch.tensor([1, 7])
    with torch.no_grad():
        want = nchw_to_nhwc(t2n(ref(x, t, y)))
    got = ours.apply(
        {"params": p}, jnp.asarray(nchw_to_nhwc(t2n(x))),
        jnp.asarray(t2n(t)), jnp.asarray(t2n(y)),
    )
    # structural check too: identical parameter count
    init_p = jax.jit(ours.init)(
        jax.random.key(0), jnp.zeros((1, 16, 16, 1)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )
    n_ref_usable = sum(
        v.numel() for k, v in ref.state_dict().items()
        if not (k.startswith("bottleneck") and "mlp_t" in k)
    )
    n_ours = sum(v.size for v in jax.tree.leaves(init_p))
    assert n_ours == n_ref_usable, (n_ours, n_ref_usable)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def _map_vae_resblock(ref) -> dict:
    out = {
        "GroupNorm_0": {"scale": t2n(ref.norm1.weight), "bias": t2n(ref.norm1.bias)},
        "Conv_0": {"kernel": conv_kernel(ref.conv1.weight), "bias": t2n(ref.conv1.bias)},
        "GroupNorm_1": {"scale": t2n(ref.norm2.weight), "bias": t2n(ref.norm2.bias)},
        "Conv_1": {"kernel": conv_kernel(ref.conv2.weight), "bias": t2n(ref.conv2.bias)},
    }
    if not isinstance(ref.nin_shortcut, torch.nn.Identity):
        out["Conv_2"] = {"kernel": conv_kernel(ref.nin_shortcut.weight),
                         "bias": t2n(ref.nin_shortcut.bias)}
    return out


def _map_vae_attn(ref) -> dict:
    def dense(conv):
        return {"kernel": t2n(conv.weight)[:, :, 0, 0].T, "bias": t2n(conv.bias)}

    return {
        "GroupNorm_0": {"scale": t2n(ref.norm.weight), "bias": t2n(ref.norm.bias)},
        "Dense_0": dense(ref.q), "Dense_1": dense(ref.k), "Dense_2": dense(ref.v),
        "Dense_3": dense(ref.proj_out),
    }


def _conv(ref) -> dict:
    return {"kernel": conv_kernel(ref.weight), "bias": t2n(ref.bias)}


def test_whole_autoencoder_matches_reference():
    """FULL VAE parity: encoder (blocks-per-resolution + asymmetric downsample +
    mid attention + moments head), quant/post-quant convs, and decoder
    (n_resnet_blocks+1 per level + nearest upsample), identical weights
    (reference src/Autoencoder.py:183-462)."""
    ch, mults, nrb, z = 32, [1, 2], 1, 4
    ref = ref_ae.Autoencoder(
        in_channels=1, z_channels=z, out_channels=1, channels=ch,
        channel_multipliers=mults, n_resnet_blocks=nrb,
    ).eval()
    enc, dec = ref.encoder, ref.decoder

    # ---- encoder params: Conv_0, ResnetBlock_i (+DownSample_j), mid, head
    ep = {"Conv_0": _conv(enc.conv_in)}
    rb = ds = 0
    for down in enc.down:
        for block in down.block:
            ep[f"ResnetBlock_{rb}"] = _map_vae_resblock(block); rb += 1
        if not isinstance(down.downsample, torch.nn.Identity):
            ep[f"DownSample_{ds}"] = {"Conv_0": _conv(down.downsample.conv)}; ds += 1
    ep[f"ResnetBlock_{rb}"] = _map_vae_resblock(enc.mid.block_1)
    ep["AttnBlock_0"] = _map_vae_attn(enc.mid.attn_1)
    ep[f"ResnetBlock_{rb + 1}"] = _map_vae_resblock(enc.mid.block_2)
    ep["GroupNorm_0"] = {"scale": t2n(enc.norm_out.weight),
                         "bias": t2n(enc.norm_out.bias)}
    ep["Conv_1"] = _conv(enc.conv_out)

    # ---- decoder params: Conv_0, mid, ResnetBlock_i (+UpSample_j), head
    dp = {"Conv_0": _conv(dec.conv_in)}
    dp["ResnetBlock_0"] = _map_vae_resblock(dec.mid.block_1)
    dp["AttnBlock_0"] = _map_vae_attn(dec.mid.attn_1)
    dp["ResnetBlock_1"] = _map_vae_resblock(dec.mid.block_2)
    rb, us = 2, 0
    for up in reversed(dec.up):  # forward iterates reversed(self.up)
        for block in up.block:
            dp[f"ResnetBlock_{rb}"] = _map_vae_resblock(block); rb += 1
        if not isinstance(up.upsample, torch.nn.Identity):
            dp[f"UpSample_{us}"] = {"Conv_0": _conv(up.upsample.conv)}; us += 1
    dp["GroupNorm_0"] = {"scale": t2n(dec.norm_out.weight),
                         "bias": t2n(dec.norm_out.bias)}
    dp["Conv_1"] = _conv(dec.conv_out)

    params = {"params": {
        "encoder": ep, "decoder": dp,
        "quant_conv": _conv(ref.quant_conv),
        "post_quant_conv": _conv(ref.post_quant_conv),
    }}
    ours = our_ae.Autoencoder(in_channels=1, out_channels=1, channels=ch,
                              channel_multipliers=tuple(mults),
                              n_resnet_blocks=nrb, z_channels=z)

    x = rand_nchw(2, 1, 16, 16)
    with torch.no_grad():
        dist = ref.encode(x)
        want_mu, want_lv = nchw_to_nhwc(t2n(dist.mu)), nchw_to_nhwc(t2n(dist.log_var))
        zt = rand_nchw(2, z, 8, 8, seed=3)
        want_img = nchw_to_nhwc(t2n(ref.decode(zt)))

    moments = ours.apply(
        params, jnp.asarray(nchw_to_nhwc(t2n(x))), method=ours.encode_moments
    )
    mu, lv = our_ae.Autoencoder.moments_split(moments)
    np.testing.assert_allclose(np.asarray(mu), want_mu, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lv), want_lv, atol=1e-4)
    img = ours.apply(
        params, jnp.asarray(nchw_to_nhwc(t2n(zt))), method=ours.decode
    )
    np.testing.assert_allclose(np.asarray(img), want_img, atol=1e-4)


def test_whole_resnet_classifier_matches_reference_eval():
    """FULL classifier parity in eval mode, probs=True vs the reference's in-model
    Softmax (src/ResNetClassifier.py:152-243): stem conv+BN (no ReLU — reference
    quirk kept), stride-2 only on the very first block, global average pool,
    linear head. The reference's head hardcodes Linear(512, .), so the test uses
    n_channels ending in 512."""
    n_blocks, n_channels = [1, 1], [8, 512]
    ref = ref_rn.ResNetBase(img_channels=1, out_channels=10,
                            n_blocks=n_blocks, n_channels=n_channels).eval()
    with torch.no_grad():  # non-trivial running stats everywhere
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    params = {"Conv_0": {"kernel": conv_kernel(ref.conv.weight)}}
    stats = {}
    bn_p, bn_s = _bn(ref.bn)
    params["BatchNorm_0"] = bn_p
    stats["BatchNorm_0"] = bn_s
    for i, block in enumerate(ref.blocks):
        bp, bs = {}, {}
        k = 0
        if not isinstance(block.shortcut, torch.nn.Identity):
            bp[f"Conv_{k}"] = {"kernel": conv_kernel(block.shortcut.conv.weight),
                               "bias": t2n(block.shortcut.conv.bias)}
            p0, s0 = _bn(block.shortcut.bn)
            bp[f"BatchNorm_{k}"], bs[f"BatchNorm_{k}"] = p0, s0
            k += 1
        p1, s1 = _bn(block.bn1)
        bp[f"Conv_{k}"] = {"kernel": conv_kernel(block.conv1.weight)}
        bp[f"BatchNorm_{k}"], bs[f"BatchNorm_{k}"] = p1, s1
        p2, s2 = _bn(block.bn2)
        bp[f"Conv_{k + 1}"] = {"kernel": conv_kernel(block.conv2.weight)}
        bp[f"BatchNorm_{k + 1}"], bs[f"BatchNorm_{k + 1}"] = p2, s2
        params[f"ResidualBlock_{i}"] = bp
        stats[f"ResidualBlock_{i}"] = bs
    params["Dense_0"] = {"kernel": linear_kernel(ref.final_linear.weight),
                         "bias": t2n(ref.final_linear.bias)}

    ours = our_rn.ResNetBase(img_channels=1, out_channels=10,
                             n_blocks=tuple(n_blocks),
                             n_channels=tuple(n_channels))
    x = rand_nchw(2, 1, 16, 16)
    with torch.no_grad():
        want = t2n(ref(x))
    got = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(nchw_to_nhwc(t2n(x))), train=False, probs=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
