"""Training engine tests: end-to-end tiny run, checkpoint round trip, EMA,
early stopping semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tpu.config import Config, DataConfig, DiffusionConfig, ModelConfig
from ldm_tpu.data.datasets import synthetic_dataset
from ldm_tpu.data.loader import DataLoader
from ldm_tpu.factory import build_diffusion, build_model
from ldm_tpu.training import checkpoint as ckpt
from ldm_tpu.training.diffusion_trainer import DiffusionTrainer
from ldm_tpu.training.early_stopping import EarlyStopping
from ldm_tpu.training.state import TrainState, make_optimizer


@pytest.fixture(scope="module")
def tiny_trainer(tmp_path_factory):
    cfg = Config(
        project_name="t", workdir=str(tmp_path_factory.mktemp("runs")),
        epochs=2, batch_size=16, use_amp=False, seed=0,
        model=ModelConfig(params=dict(
            in_channels=1, out_channels=1, channels=8,
            channel_multipliers=[1, 2], num_classes=10,
        )),
        diffusion=DiffusionConfig(n_steps=8, cfg_scale=3),
        data=DataConfig(dataset="SYNTHETIC", image_size=16, image_channels=1),
    )
    ds = synthetic_dataset(96, 16, 1, seed=0)
    tl = DataLoader(ds.subset(np.arange(64)), cfg.batch_size, seed=0)
    vl = DataLoader(ds.subset(np.arange(64, 96)), cfg.batch_size, seed=1)
    tr = DiffusionTrainer(cfg, build_model(cfg), build_diffusion(cfg), tl, vl,
                          classes=list(range(10)))
    return tr


def test_train_reduces_loss_and_checkpoints(tiny_trainer):
    tr = tiny_trainer
    hist = tr.train()
    assert len(hist["train_loss"]) == 2
    assert all(np.isfinite(hist["train_loss"]))
    assert hist["train_loss"][1] < hist["train_loss"][0]
    assert int(tr.state.step) == 8  # 4 batches x 2 epochs
    assert ckpt.latest_checkpoint(tr.config.checkpoints) is not None


def test_ema_tracks_but_lags(tiny_trainer):
    tr = tiny_trainer
    p = jax.tree.leaves(tr.state.params)[0]
    e = jax.tree.leaves(tr.state.ema_params)[0]
    assert not np.allclose(np.asarray(p), np.asarray(e))


def test_checkpoint_roundtrip(tiny_trainer, tmp_path):
    tr = tiny_trainer
    path = ckpt.save_state(str(tmp_path / "s.msgpack"), tr.state)
    fresh = TrainState.create(
        jax.tree.map(jnp.zeros_like, tr.state.params),
        make_optimizer(1e-3), jax.random.key(9),
    )
    restored = ckpt.restore_state(path, fresh)
    assert int(restored.step) == int(tr.state.step)
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(tr.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state continues training without shape errors
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(restored.key)),
        np.asarray(jax.random.key_data(tr.state.key)),
    )


def test_params_only_roundtrip(tiny_trainer, tmp_path):
    tr = tiny_trainer
    p = ckpt.save_params(str(tmp_path / "p.msgpack"), tr.state.params)
    template = jax.tree.map(jnp.zeros_like, tr.state.params)
    loaded = ckpt.load_params(p, template)
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(tr.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sample_outputs_uint8(tiny_trainer):
    imgs = tiny_trainer.sample([0, 1], cfg_scale=3.0)
    assert imgs.shape == (2, 16, 16, 1)
    assert imgs.dtype == np.uint8


def test_sample_ddim_method(tiny_trainer):
    """The trainer's sampler switch (capability-plus few-step DDIM) produces
    uint8 images and is deterministic in the loop key at eta=0."""
    k = jax.random.key(5)
    a = tiny_trainer.sample([0, 1], cfg_scale=3.0, key=k, method="ddim",
                            ddim_steps=3)
    b = tiny_trainer.sample([0, 1], cfg_scale=3.0, key=jax.random.key(6),
                            method="ddim", ddim_steps=3)
    assert a.shape == (2, 16, 16, 1) and a.dtype == np.uint8
    # eta=0: only x_init (drawn from the key) differs — different keys give
    # different images, same key gives identical ones
    c = tiny_trainer.sample([0, 1], cfg_scale=3.0, key=k, method="ddim",
                            ddim_steps=3)
    np.testing.assert_array_equal(a, c)
    assert not np.array_equal(a, b)


def test_deterministic_training(tmp_path):
    """Same config + data ⇒ bit-identical loss history (explicit PRNG threading)."""
    def run(workdir):
        cfg = Config(
            project_name="d", workdir=workdir, epochs=1, batch_size=16,
            use_amp=False, seed=7,
            model=ModelConfig(params=dict(
                in_channels=1, out_channels=1, channels=8,
                channel_multipliers=[1], num_classes=10,
            )),
            diffusion=DiffusionConfig(n_steps=8),
            data=DataConfig(dataset="SYNTHETIC", image_size=8, image_channels=1),
        )
        ds = synthetic_dataset(32, 8, 1, seed=0)
        tl = DataLoader(ds, cfg.batch_size, seed=0)
        vl = DataLoader(ds, cfg.batch_size, seed=1)
        tr = DiffusionTrainer(cfg, build_model(cfg), build_diffusion(cfg), tl, vl,
                              classes=list(range(10)))
        return tr.train()

    h1 = run(str(tmp_path / "a"))
    h2 = run(str(tmp_path / "b"))
    assert h1 == h2


def test_early_stopping_semantics():
    saved = []
    es = EarlyStopping(patience=2, save_fn=lambda s: saved.append(s))
    es(1.0, "s0")
    assert saved == ["s0"]  # first call always saves (src/EarlyStopping.py:40-43)
    es(0.5, "s1")
    assert saved == ["s0", "s1"] and es.counter == 0
    es(0.6, "s2")
    assert es.counter == 1 and not es.early_stop
    es(0.6, "s3")
    assert es.early_stop  # patience 2 exhausted
    assert saved == ["s0", "s1"]


def test_scan_epochs_flag_gates_fast_path(tmp_path):
    import dataclasses

    from ldm_tpu.config import Config, DataConfig, DiffusionConfig, ModelConfig
    from ldm_tpu.data.datasets import synthetic_dataset
    from ldm_tpu.data.loader import DataLoader
    from ldm_tpu.factory import build_diffusion, build_model
    from ldm_tpu.training.diffusion_trainer import DiffusionTrainer

    cfg = Config(
        project_name="scanflag", workdir=str(tmp_path), epochs=1, batch_size=8,
        use_amp=False, seed=0,
        model=ModelConfig(params=dict(
            in_channels=1, out_channels=1, channels=8,
            channel_multipliers=[1], num_classes=10,
        )),
        diffusion=DiffusionConfig(n_steps=4),
        data=DataConfig(dataset="SYNTHETIC", image_size=8, image_channels=1),
    )
    ds = synthetic_dataset(24, 8, 1, seed=0)

    def make(cfg):
        return DiffusionTrainer(
            cfg, build_model(cfg), build_diffusion(cfg),
            DataLoader(ds, 8, seed=0), DataLoader(ds, 8, seed=1),
            classes=list(range(10)),
        )

    assert make(cfg)._epoch_scan is not None  # default: on
    off = make(dataclasses.replace(cfg, scan_epochs=False))
    assert off._epoch_scan is None
    hist = off.train()  # the per-batch fallback path still trains
    assert np.isfinite(hist["train_loss"][0])


def test_scan_epoch_matches_per_batch(tmp_path):
    """With shuffle=False the epoch-as-scan fast path and the per-batch fallback
    see identical batch sequences and PRNG streams, so they must compute the same
    math: equal loss histories and equal final params (VERDICT.md round 1, weak #3)."""
    import dataclasses

    base = Config(
        project_name="scaneq", epochs=2, batch_size=16, use_amp=False, seed=5,
        sample_every=0,
        model=ModelConfig(params=dict(
            in_channels=1, out_channels=1, channels=8,
            channel_multipliers=[1], num_classes=10,
        )),
        diffusion=DiffusionConfig(n_steps=4),
        data=DataConfig(dataset="SYNTHETIC", image_size=8, image_channels=1),
    )
    ds = synthetic_dataset(48, 8, 1, seed=0)

    def run(scan: bool, workdir):
        cfg = dataclasses.replace(base, workdir=workdir, scan_epochs=scan)
        tr = DiffusionTrainer(
            cfg, build_model(cfg), build_diffusion(cfg),
            DataLoader(ds, 16, shuffle=False, seed=0),
            DataLoader(ds, 16, shuffle=False, seed=1),
            classes=list(range(10)),
        )
        assert (tr._epoch_scan is not None) == scan
        hist = tr.train()
        return hist, tr.state

    h_scan, s_scan = run(True, str(tmp_path / "scan"))
    h_batch, s_batch = run(False, str(tmp_path / "batch"))
    np.testing.assert_allclose(
        h_scan["train_loss"], h_batch["train_loss"], rtol=1e-6
    )
    np.testing.assert_allclose(h_scan["val_loss"], h_batch["val_loss"], rtol=1e-6)
    # params: each Adam step moves ~lr regardless of grad scale, so last-ulp
    # XLA-fusion differences (scan-wrapped vs standalone step) amplify to a few
    # lr per step; a real math mismatch (wrong batch order/scaling) diverges at
    # O(0.1) and the 1e-6 loss check above would already have caught it
    for a, b in zip(jax.tree.leaves(s_scan.params), jax.tree.leaves(s_batch.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_epoch_scan_eligibility_gates():
    """build_epoch_scan must decline loaders it can't faithfully compile."""
    from ldm_tpu.data.datasets import synthetic_dataset
    from ldm_tpu.data.loader import DataLoader
    from ldm_tpu.data.transforms import scale_to_zero_one
    from ldm_tpu.training.scan_epochs import build_epoch_scan

    ds = synthetic_dataset(32, 8, 1, seed=0)
    body = lambda s, b: (s, jnp.float32(0))  # noqa: E731

    assert build_epoch_scan(body, DataLoader(ds, 8)) is not None
    # non-standard transform: the inline /255*2-1 scaling wouldn't match
    assert build_epoch_scan(
        body, DataLoader(ds, 8, transform=scale_to_zero_one)
    ) is None
    # drop_last=False: variable tail batch can't live in a scan
    assert build_epoch_scan(body, DataLoader(ds, 8, drop_last=False)) is None
    # batch larger than the dataset
    assert build_epoch_scan(body, DataLoader(ds, 64)) is None
    # disabled by config flag
    assert build_epoch_scan(body, DataLoader(ds, 8), enabled=False) is None


def test_checkpoint_and_sample_cadence(tmp_path, monkeypatch):
    """sample_every / checkpoint_every gate the grid sampling and full-state
    writes; the best state always flushes by the end of train()."""
    import dataclasses
    import os

    from ldm_tpu.config import Config, DataConfig, DiffusionConfig, ModelConfig
    from ldm_tpu.data.datasets import synthetic_dataset
    from ldm_tpu.data.loader import DataLoader
    from ldm_tpu.factory import build_diffusion, build_model
    from ldm_tpu.training.diffusion_trainer import DiffusionTrainer

    cfg = Config(
        project_name="cadence", workdir=str(tmp_path), epochs=3, batch_size=8,
        use_amp=False, seed=0, sample_every=100, checkpoint_every=100,
        model=ModelConfig(params=dict(
            in_channels=1, out_channels=1, channels=8,
            channel_multipliers=[1], num_classes=10,
        )),
        diffusion=DiffusionConfig(n_steps=4),
        data=DataConfig(dataset="SYNTHETIC", image_size=8, image_channels=1),
    )
    ds = synthetic_dataset(24, 8, 1, seed=0)
    tr = DiffusionTrainer(
        cfg, build_model(cfg), build_diffusion(cfg),
        DataLoader(ds, 8, seed=0), DataLoader(ds, 8, seed=1),
        classes=list(range(10)),
    )
    calls = {"n": 0}
    orig = tr.sample
    tr.sample = lambda *a, **k: calls.__setitem__("n", calls["n"] + 1) or orig(*a, **k)
    tr.train()
    # sample_every=100 > epochs, and epoch 0 (untrained params) never samples
    assert calls["n"] == 0
    # the latest state AND the best checkpoint always flush at train() end,
    # regardless of cadence — --resume must never see a stale state.msgpack
    assert os.path.exists(f"{cfg.checkpoints}/state.msgpack")
    assert os.path.exists(f"{cfg.checkpoints}/diffusion_model.msgpack")
    assert os.path.exists(f"{cfg.checkpoints}/best_state.msgpack")


def test_cadence_zero_means_never(tmp_path):
    """sample_every=0 / checkpoint_every=0 disable the cadences outright
    (a 0 used to ZeroDivisionError at the modulo checks — ADVICE.md round 1)."""
    import os

    from ldm_tpu.config import Config, DataConfig, DiffusionConfig, ModelConfig
    from ldm_tpu.data.datasets import synthetic_dataset
    from ldm_tpu.data.loader import DataLoader
    from ldm_tpu.factory import build_diffusion, build_model
    from ldm_tpu.training.diffusion_trainer import DiffusionTrainer

    cfg = Config(
        project_name="cadence0", workdir=str(tmp_path), epochs=2, batch_size=8,
        use_amp=False, seed=0, sample_every=0, checkpoint_every=0,
        model=ModelConfig(params=dict(
            in_channels=1, out_channels=1, channels=8,
            channel_multipliers=[1], num_classes=10,
        )),
        diffusion=DiffusionConfig(n_steps=4),
        data=DataConfig(dataset="SYNTHETIC", image_size=8, image_channels=1),
    )
    ds = synthetic_dataset(24, 8, 1, seed=0)
    tr = DiffusionTrainer(
        cfg, build_model(cfg), build_diffusion(cfg),
        DataLoader(ds, 8, seed=0), DataLoader(ds, 8, seed=1),
        classes=list(range(10)),
    )
    tr.sample = lambda *a, **k: pytest.fail("sample_every=0 must never sample")
    tr.train()
    # final-state write still happens (resume safety), best flushed at end
    assert os.path.exists(f"{cfg.checkpoints}/state.msgpack")

    with pytest.raises(ValueError):
        Config(sample_every=-1)
    with pytest.raises(ValueError):
        Config(checkpoint_every=-2)


def test_fused_apply_gradients_matches_optax():
    """fused_apply_gradients (one re-associated Adam+EMA pass,
    perf/probe37) must be step-for-step interchangeable with the optax
    chain: identical params, EMA, moments, and count over chained steps,
    including the step-0 bias-correction and EMA-warmup edge."""
    from ldm_tpu.training.state import fused_apply_gradients

    key = jax.random.key(0)
    params = {
        "w": jax.random.normal(key, (7, 5), jnp.float32),
        "b": {"c": jnp.ones((5,), jnp.float32)},
    }
    lr = 3e-3
    s_a = TrainState.create(params, make_optimizer(lr), jax.random.key(1))
    s_b = s_a
    for i in range(4):
        g = jax.tree.map(
            lambda p, i=i: jax.random.normal(
                jax.random.fold_in(key, i), p.shape) * 0.1,
            params,
        )
        s_a = s_a.apply_gradients(g)
        s_b = fused_apply_gradients(s_b, g, lr)
    assert int(s_b.step) == 4
    for name, ta, tb in [
        ("params", s_a.params, s_b.params),
        ("ema", s_a.ema_params, s_b.ema_params),
        ("opt", s_a.opt_state, s_b.opt_state),
    ]:
        for a, b in zip(jax.tree.leaves(ta), jax.tree.leaves(tb)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=0, atol=1e-6, err_msg=name)


def test_fused_apply_gradients_rejects_mismatched_hyperparams():
    """ADVICE r4 drift guard: when the state's tx IS make_optimizer(lr)
    (memoized — identity is exact), non-default Adam hyperparameters passed
    to the fused pass would silently diverge from the moments' optimizer, so
    the call must assert instead."""
    from ldm_tpu.training.state import fused_apply_gradients

    lr = 3e-3
    params = {"w": jnp.ones((3,), jnp.float32)}
    state = TrainState.create(params, make_optimizer(lr), jax.random.key(0))
    grads = {"w": jnp.full((3,), 0.1, jnp.float32)}
    with pytest.raises(AssertionError, match="fused pass was given"):
        fused_apply_gradients(state, grads, lr, b1=0.95)
    # a WRONG lr must fire too (the most likely drift — round-5 review:
    # the original guard only checked b1/b2/eps when the lr already matched)
    with pytest.raises(AssertionError, match="fused pass was given"):
        fused_apply_gradients(state, grads, 5e-4)
    with pytest.raises(AssertionError, match="fused pass was given"):
        fused_apply_gradients(state, grads, 5e-4, b1=0.95)
    # matching defaults still work
    out = fused_apply_gradients(state, grads, lr)
    assert int(out.step) == 1
