"""The torch-checkpoint migration path (ldm_tpu/utils/torch_import.py).

Same golden-parity standard as tests/test_torch_parity.py, but through the
KEY-BASED state_dict mappers a migrating user actually hits: the reference
module is instantiated, its ``state_dict()`` saved/mapped, and the imported
flax model must reproduce the torch outputs.  Plus the CLI end to end on a
real ``.pt`` file (scripts/import_torch_checkpoint.py).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
ref_unet = pytest.importorskip("src.UNet")
ref_ae = pytest.importorskip("src.Autoencoder")
ref_rn = pytest.importorskip("src.ResNetClassifier")

from ldm_tpu.models import autoencoder as our_ae  # noqa: E402
from ldm_tpu.models import resnet as our_rn  # noqa: E402
from ldm_tpu.models import unet as our_unet  # noqa: E402
from ldm_tpu.utils import torch_import as ti  # noqa: E402

ATOL = 1e-4


def t2n(t):
    return t.detach().cpu().numpy()


def nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def rand_nchw(*shape, seed=0):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(*shape, generator=g)


def sd_numpy(module):
    return {k: t2n(v) for k, v in module.state_dict().items()}


def test_unet_state_dict_import_matches_reference():
    ch, mults, nc = 16, (1, 2), 10
    ref = ref_unet.UNet(in_channels=1, out_channels=1, channels=ch,
                        channel_multipliers=list(mults), num_classes=nc).eval()
    mapped = ti.unet_params_from_state_dict(sd_numpy(ref))
    ours = our_unet.UNet(in_channels=1, out_channels=1, channels=ch,
                         channel_multipliers=mults, num_classes=nc,
                         bottleneck_time_emb=False)

    x = rand_nchw(2, 1, 16, 16)
    t = torch.tensor([3, 250])
    y = torch.tensor([1, 7])
    with torch.no_grad():
        want = nchw_to_nhwc(t2n(ref(x, t, y)))
    got = ours.apply(mapped, jnp.asarray(nchw_to_nhwc(t2n(x))),
                     jnp.asarray(t2n(t)), jnp.asarray(t2n(y)))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)

    # structural template check both ways
    template = jax.eval_shape(
        ours.init, jax.random.key(0), jnp.zeros((1, 16, 16, 1)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )
    ti.check_against_template(mapped, template)


def test_unet_import_with_bottleneck_time_emb_fills_fixed_model():
    """--bottleneck-time-emb imports the reference's untrained bottleneck MLPs
    so the tree matches our default (fixed) UNet."""
    ref = ref_unet.UNet(in_channels=1, out_channels=1, channels=16,
                        channel_multipliers=[1, 2], num_classes=10)
    mapped = ti.unet_params_from_state_dict(sd_numpy(ref),
                                            bottleneck_time_emb=True)
    ours = our_unet.UNet(in_channels=1, out_channels=1, channels=16,
                         channel_multipliers=(1, 2), num_classes=10)
    template = jax.eval_shape(
        ours.init, jax.random.key(0), jnp.zeros((1, 16, 16, 1)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )
    ti.check_against_template(mapped, template)


def test_autoencoder_state_dict_import_matches_reference():
    ch, mults, nrb, z = 32, [1, 2], 1, 4
    ref = ref_ae.Autoencoder(
        in_channels=1, z_channels=z, out_channels=1, channels=ch,
        channel_multipliers=mults, n_resnet_blocks=nrb,
    ).eval()
    mapped = ti.autoencoder_params_from_state_dict(sd_numpy(ref))
    ours = our_ae.Autoencoder(in_channels=1, out_channels=1, channels=ch,
                              channel_multipliers=tuple(mults),
                              n_resnet_blocks=nrb, z_channels=z)

    x = rand_nchw(2, 1, 16, 16)
    with torch.no_grad():
        dist = ref.encode(x)
        want_mu = nchw_to_nhwc(t2n(dist.mu))
        zt = rand_nchw(2, z, 8, 8, seed=3)
        want_img = nchw_to_nhwc(t2n(ref.decode(zt)))
    moments = ours.apply(mapped, jnp.asarray(nchw_to_nhwc(t2n(x))),
                         method=ours.encode_moments)
    mu, _ = our_ae.Autoencoder.moments_split(moments)
    np.testing.assert_allclose(np.asarray(mu), want_mu, atol=ATOL)
    img = ours.apply(mapped, jnp.asarray(nchw_to_nhwc(t2n(zt))),
                     method=ours.decode)
    np.testing.assert_allclose(np.asarray(img), want_img, atol=ATOL)


def test_classifier_state_dict_import_matches_reference_eval():
    n_blocks, n_channels = [1, 1], [8, 512]
    ref = ref_rn.ResNetBase(img_channels=1, out_channels=10,
                            n_blocks=n_blocks, n_channels=n_channels).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    mapped = ti.resnet_params_from_state_dict(sd_numpy(ref))
    ours = our_rn.ResNetBase(img_channels=1, out_channels=10,
                             n_blocks=tuple(n_blocks),
                             n_channels=tuple(n_channels))
    x = rand_nchw(2, 1, 16, 16)
    with torch.no_grad():
        want = t2n(ref(x))
    got = ours.apply(mapped, jnp.asarray(nchw_to_nhwc(t2n(x))),
                     train=False, probs=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_import_errors_are_loud():
    ref = ref_unet.UNet(in_channels=1, out_channels=1, channels=16,
                        channel_multipliers=[1, 2], num_classes=10)
    sd = sd_numpy(ref)
    # missing key
    broken = dict(sd)
    del broken["initial_conv.weight"]
    with pytest.raises(KeyError, match="initial_conv"):
        ti.unet_params_from_state_dict(broken)
    # unconsumed key
    extra = dict(sd)
    extra["mystery.weight"] = np.zeros((1,))
    with pytest.raises(ValueError, match="not consumed"):
        ti.unet_params_from_state_dict(extra)
    # wrong family
    with pytest.raises(ValueError, match="not a reference Autoencoder"):
        ti.autoencoder_params_from_state_dict(sd)


def test_detect_kind():
    u = ref_unet.UNet(in_channels=1, out_channels=1, channels=16,
                      channel_multipliers=[1, 2], num_classes=10)
    a = ref_ae.Autoencoder(in_channels=1, z_channels=4, out_channels=1,
                           channels=32, channel_multipliers=[1, 2],
                           n_resnet_blocks=1)
    r = ref_rn.ResNetBase(img_channels=1, out_channels=10,
                          n_blocks=[1, 1], n_channels=[8, 512])
    assert ti.detect_kind(sd_numpy(u)) == "unet"
    assert ti.detect_kind(sd_numpy(a)) == "autoencoder"
    assert ti.detect_kind(sd_numpy(r)) == "classifier"
    with pytest.raises(ValueError, match="cannot detect"):
        ti.detect_kind({"foo.weight": np.zeros(1)})


# ------------------------------------------------------------------ export
from ldm_tpu.utils import torch_export as te  # noqa: E402


def test_unet_export_roundtrips_reference_state_dict():
    ref = ref_unet.UNet(in_channels=1, out_channels=1, channels=16,
                        channel_multipliers=[1, 2], num_classes=10)
    sd = sd_numpy(ref)
    mapped = ti.unet_params_from_state_dict(sd, bottleneck_time_emb=True)
    te.roundtrip_check(te.unet_state_dict_from_params(mapped), sd)


def test_unet_export_loads_strict_and_matches_our_forward():
    """A model trained HERE exports to a state_dict the reference loads
    strict=True, and the torch forward equals our forward (the reference
    ignores the zero-filled bottleneck MLPs it never calls)."""
    ours = our_unet.UNet(in_channels=1, out_channels=1, channels=16,
                         channel_multipliers=(1, 2), num_classes=10,
                         bottleneck_time_emb=False)
    params = jax.jit(ours.init)(
        jax.random.key(7), jnp.zeros((1, 16, 16, 1)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )
    sd = te.unet_state_dict_from_params(jax.tree.map(np.asarray, params))
    ref = ref_unet.UNet(in_channels=1, out_channels=1, channels=16,
                        channel_multipliers=[1, 2], num_classes=10).eval()
    ref.load_state_dict({k: torch.from_numpy(np.array(v))
                         for k, v in sd.items()}, strict=True)
    x = rand_nchw(2, 1, 16, 16)
    t = torch.tensor([3, 250])
    y = torch.tensor([1, 7])
    with torch.no_grad():
        want = nchw_to_nhwc(t2n(ref(x, t, y)))
    got = ours.apply(params, jnp.asarray(nchw_to_nhwc(t2n(x))),
                     jnp.asarray(t2n(t)), jnp.asarray(t2n(y)))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_autoencoder_export_roundtrips_reference_state_dict():
    ref = ref_ae.Autoencoder(in_channels=1, z_channels=4, out_channels=1,
                             channels=32, channel_multipliers=[1, 2],
                             n_resnet_blocks=1)
    sd = sd_numpy(ref)
    mapped = ti.autoencoder_params_from_state_dict(sd)
    te.roundtrip_check(
        te.autoencoder_state_dict_from_params(mapped, n_resnet_blocks=1), sd)


def test_classifier_export_roundtrips_reference_state_dict():
    ref = ref_rn.ResNetBase(img_channels=1, out_channels=10,
                            n_blocks=[1, 1], n_channels=[8, 512])
    sd = sd_numpy(ref)
    mapped = ti.resnet_params_from_state_dict(sd)
    te.roundtrip_check(te.resnet_state_dict_from_params(mapped), sd)


def test_cli_import_default_follows_model(tmp_path):
    """No --bottleneck-time-emb flag: the import matches whatever the config's
    model builds (our default fixed bottleneck), so the documented
    zero-extra-steps invocation succeeds for shipped configs."""
    from scripts.import_torch_checkpoint import main as import_main

    ref = ref_unet.UNet(in_channels=1, out_channels=1, channels=8,
                        channel_multipliers=[1, 2], num_classes=10)
    pt = tmp_path / "ref.pt"
    torch.save(ref.state_dict(), str(pt))
    out = tmp_path / "imported.msgpack"
    import_main([str(pt), "configs/smoke_synthetic.yaml",
                 "--out", str(out), "--cpu"])
    assert os.path.exists(out)


def test_cli_import_latent_space_unet(tmp_path):
    """A latent-space UNet's in_channels is the VAE's z_channels, not the
    dataset's image_channels — the import template must follow the model."""
    from scripts.import_torch_checkpoint import main as import_main

    ref = ref_unet.UNet(in_channels=8, out_channels=8, channels=64,
                        channel_multipliers=[1], num_classes=10)
    pt = tmp_path / "latent_unet.pt"
    torch.save(ref.state_dict(), str(pt))
    out = tmp_path / "imported.msgpack"
    import_main([str(pt), "configs/latent_diffusion_cifar10.yaml",
                 "--out", str(out), "--cpu"])
    assert os.path.exists(out)


def test_cli_export_autodetects_classifier(tmp_path):
    """kind=auto reads the msgpack tree itself (batch_stats => classifier),
    independent of what model the config builds."""
    from scripts.export_torch_checkpoint import main as export_main
    from ldm_tpu.training import checkpoint as ckpt

    ref = ref_rn.ResNetBase(img_channels=1, out_channels=10,
                            n_blocks=[1, 1], n_channels=[8, 512])
    sd = sd_numpy(ref)
    variables = ti.resnet_params_from_state_dict(sd)
    msgpack = tmp_path / "classifier.msgpack"
    ckpt.save_params(str(msgpack), variables)
    out_pt = tmp_path / "classifier.pt"
    export_main([str(msgpack), "configs/smoke_synthetic.yaml",
                 "--out", str(out_pt), "--cpu"])
    back = {k: t2n(v) for k, v in torch.load(str(out_pt)).items()}
    te.roundtrip_check(back, sd)


def test_export_errors_are_loud():
    ref = ref_ae.Autoencoder(in_channels=1, z_channels=4, out_channels=1,
                             channels=32, channel_multipliers=[1, 2],
                             n_resnet_blocks=1)
    mapped = ti.autoencoder_params_from_state_dict(sd_numpy(ref))
    with pytest.raises(ValueError, match="n_resnet_blocks"):
        te.autoencoder_state_dict_from_params(mapped, n_resnet_blocks=2)
    with pytest.raises(ValueError, match="not a UNet"):
        te.unet_state_dict_from_params(mapped)


def test_cli_export_roundtrip(tmp_path):
    """import CLI -> export CLI -> the original reference tensors come back."""
    from scripts.export_torch_checkpoint import main as export_main
    from scripts.import_torch_checkpoint import main as import_main

    ref = ref_unet.UNet(in_channels=1, out_channels=1, channels=8,
                        channel_multipliers=[1, 2], num_classes=10)
    sd = sd_numpy(ref)
    pt = tmp_path / "ref.pt"
    torch.save(ref.state_dict(), str(pt))
    msgpack = tmp_path / "imported.msgpack"
    import_main([str(pt), "configs/smoke_synthetic.yaml",
                 "--out", str(msgpack), "--bottleneck-time-emb", "--cpu"])
    out_pt = tmp_path / "exported.pt"
    export_main([str(msgpack), "configs/smoke_synthetic.yaml",
                 "--out", str(out_pt), "--cpu"])
    back = {k: t2n(v) for k, v in torch.load(str(out_pt)).items()}
    te.roundtrip_check(back, sd)


def test_cli_imports_reference_pt_file(tmp_path):
    """End to end: torch.save'd reference UNet -> CLI -> our msgpack weights
    load back and drive a forward pass."""
    from scripts.import_torch_checkpoint import main as import_main
    from ldm_tpu.training import checkpoint as ckpt

    ref = ref_unet.UNet(in_channels=1, out_channels=1, channels=8,
                        channel_multipliers=[1, 2], num_classes=10).eval()
    pt = tmp_path / "diffusion_model.pt"
    torch.save(ref.state_dict(), str(pt))

    out = tmp_path / "imported.msgpack"
    import_main([str(pt), "configs/smoke_synthetic.yaml",
                 "--out", str(out), "--bottleneck-time-emb", "--cpu"])
    assert os.path.exists(out)

    # the smoke config's model IS this geometry; load with its template
    ours = our_unet.UNet(in_channels=1, out_channels=1, channels=8,
                         channel_multipliers=(1, 2), num_classes=10)
    template = jax.jit(ours.init)(
        jax.random.key(0), jnp.zeros((1, 16, 16, 1)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )
    params = ckpt.load_params(str(out), template)
    x = rand_nchw(2, 1, 16, 16)
    t = torch.tensor([1, 5])
    y = torch.tensor([0, 9])
    got = ours.apply(params, jnp.asarray(nchw_to_nhwc(t2n(x))),
                     jnp.asarray(t2n(t)), jnp.asarray(t2n(y)))
    assert np.isfinite(np.asarray(got)).all()
    # and the non-bottleneck path still matches the reference exactly
    exact = our_unet.UNet(in_channels=1, out_channels=1, channels=8,
                          channel_multipliers=(1, 2), num_classes=10,
                          bottleneck_time_emb=False)
    mapped = ti.unet_params_from_state_dict(sd_numpy(ref))
    with torch.no_grad():
        want = nchw_to_nhwc(t2n(ref(x, t, y)))
    got2 = exact.apply(mapped, jnp.asarray(nchw_to_nhwc(t2n(x))),
                       jnp.asarray(t2n(t)), jnp.asarray(t2n(y)))
    np.testing.assert_allclose(np.asarray(got2), want, atol=ATOL)
