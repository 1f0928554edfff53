"""MetricsLogger tests: JSONL sink, the wandb adapter (stubbed module), and the
param/grad-norm logging that stands in for the reference's
``wandb.watch(model, log="all")`` (reference main.py:184-186)."""

import json
import sys
import types

import numpy as np

from ldm_tpu.utils.logging import MetricsLogger


class _WandbStub(types.ModuleType):
    """Minimal wandb surface the adapter touches: run, init, log, Image."""

    def __init__(self):
        super().__init__("wandb")
        self.run = None
        self.logged = []
        self.init_calls = []

    def init(self, **kw):
        self.init_calls.append(kw)
        self.run = object()
        return self.run

    def log(self, metrics, step=None):
        self.logged.append((dict(metrics), step))

    class Image:  # wandb.Image(grid)
        def __init__(self, data):
            self.data = np.asarray(data)


def _with_stub(monkeypatch):
    stub = _WandbStub()
    monkeypatch.setitem(sys.modules, "wandb", stub)
    return stub


def test_jsonl_sink_and_no_dangling_handle(tmp_path):
    lg = MetricsLogger(str(tmp_path), "proj", quiet=True)
    lg.log({"loss": 1.5, "epoch": 0}, step=0)
    lg.log({"loss": np.float32(0.5), "epoch": 1}, step=1)
    lg.close()  # no-op: writes are open-per-call
    lg.log({"loss": 0.25, "epoch": 2}, step=2)  # still works after close
    recs = [json.loads(ln) for ln in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert [r["loss"] for r in recs] == [1.5, 0.5, 0.25]
    assert all("ts" in r and "step" in r for r in recs)


def test_wandb_adapter_logs_metrics_and_images(tmp_path, monkeypatch):
    stub = _with_stub(monkeypatch)
    lg = MetricsLogger(str(tmp_path), "myproj", use_wandb=True, quiet=True)
    assert stub.init_calls and stub.init_calls[0]["project"] == "myproj"

    lg.log({"loss": np.float32(2.0)}, step=3)
    assert stub.logged[-1] == ({"loss": 2.0}, 3)

    imgs = np.zeros((4, 8, 8, 1), np.uint8)
    lg.log_images(imgs, step=5, mode="sample", dirpath=str(tmp_path / "res"))
    metrics, step = stub.logged[-1]
    assert step == 5 and "sample/images" in metrics
    assert isinstance(metrics["sample/images"][0], _WandbStub.Image)
    assert (tmp_path / "res" / "sample_step5.png").exists()


def test_wandb_adapter_absent_module_is_noop(tmp_path, monkeypatch):
    monkeypatch.setitem(sys.modules, "wandb", None)  # import -> ImportError
    lg = MetricsLogger(str(tmp_path), "p", use_wandb=True, quiet=True)
    lg.log({"loss": 1.0}, step=0)  # must not raise
    assert lg._wandb is None


def test_log_norms_global_norm(tmp_path, monkeypatch):
    stub = _with_stub(monkeypatch)
    lg = MetricsLogger(str(tmp_path), "p", use_wandb=True, quiet=True)
    tree = {"a": np.full((3,), 2.0, np.float32), "b": np.zeros((4,), np.float32)}
    lg.log_norms("params", tree, step=7)
    metrics, step = stub.logged[-1]
    assert step == 7
    np.testing.assert_allclose(
        metrics["params_global_norm"], np.sqrt(12.0), rtol=1e-6
    )
    rec = json.loads((tmp_path / "metrics.jsonl").read_text().splitlines()[-1])
    np.testing.assert_allclose(rec["params_global_norm"], np.sqrt(12.0), rtol=1e-6)


def test_trainer_logs_grad_and_param_norms(tmp_path):
    """The diffusion trainer's epoch log carries grad_global_norm and
    params_global_norm — the wandb.watch stand-in wired end to end."""
    from ldm_tpu.config import Config, DataConfig, DiffusionConfig, ModelConfig
    from ldm_tpu.data.datasets import synthetic_dataset
    from ldm_tpu.data.loader import DataLoader
    from ldm_tpu.factory import build_diffusion, build_model
    from ldm_tpu.training.diffusion_trainer import DiffusionTrainer

    cfg = Config(
        project_name="norms", workdir=str(tmp_path), epochs=1, batch_size=8,
        use_amp=False, seed=0, sample_every=0,
        model=ModelConfig(params=dict(
            in_channels=1, out_channels=1, channels=8,
            channel_multipliers=[1], num_classes=10,
        )),
        diffusion=DiffusionConfig(n_steps=4),
        data=DataConfig(dataset="SYNTHETIC", image_size=8, image_channels=1),
    )
    ds = synthetic_dataset(16, 8, 1, seed=0)
    tr = DiffusionTrainer(
        cfg, build_model(cfg), build_diffusion(cfg),
        DataLoader(ds, 8, seed=0), DataLoader(ds, 8, seed=1),
        classes=list(range(10)),
    )
    tr.train()
    recs = [json.loads(ln) for ln in
            (tmp_path / "pixel" / "norms" / "metrics.jsonl").read_text().splitlines()]
    epoch_recs = [r for r in recs if "grad_global_norm" in r]
    assert epoch_recs and epoch_recs[0]["grad_global_norm"] > 0
    assert any("params_global_norm" in r and r["params_global_norm"] > 0
               for r in recs)


def test_define_summaries_local_and_wandb(tmp_path, monkeypatch):
    """define_metric parity (reference main.py:185-186, 232-235): min/max
    summaries forwarded to wandb AND tracked locally in summary.json."""
    stub = _with_stub(monkeypatch)
    stub.define_calls = []
    stub.define_metric = lambda k, summary: stub.define_calls.append((k, summary))
    lg = MetricsLogger(str(tmp_path), "p", use_wandb=True, quiet=True)
    lg.define_summaries({"m train_loss": "min", "m valid_f1": "max"})
    assert ("m train_loss", "min") in stub.define_calls
    assert ("m valid_f1", "max") in stub.define_calls

    lg.log({"m train_loss": 2.0, "m valid_f1": 0.5}, step=0)
    lg.log({"m train_loss": 1.0, "m valid_f1": 0.9}, step=1)
    lg.log({"m train_loss": 3.0, "m valid_f1": 0.2}, step=2)
    summ = json.loads((tmp_path / "summary.json").read_text())
    assert summ["m train_loss.min"] == 1.0
    assert summ["m valid_f1.max"] == 0.9

    import pytest

    with pytest.raises(ValueError):
        lg.define_summaries({"x": "median"})


def test_define_summaries_without_wandb(tmp_path):
    """summary.json works in the wandb-less environment too."""
    lg = MetricsLogger(str(tmp_path), "p", quiet=True)
    lg.define_summaries({"loss": "min"})
    lg.log({"loss": 5.0}, step=0)
    lg.log({"loss": 3.0, "unrelated": 1.0}, step=1)
    summ = json.loads((tmp_path / "summary.json").read_text())
    assert summ == {"loss.min": 3.0}


def test_log_histograms_jsonl_and_wandb(tmp_path, monkeypatch):
    """wandb.watch(log='all') stand-in: per-leaf stats into the JSONL and
    wandb.Histogram objects when live."""
    stub = _with_stub(monkeypatch)

    class _Hist:
        def __init__(self, data):
            self.n = np.asarray(data).size

    stub.Histogram = _Hist
    lg = MetricsLogger(str(tmp_path), "p", use_wandb=True, quiet=True)
    tree = {"dense": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3),
                      "bias": np.zeros((3,), np.float32)}}
    lg.log_histograms("params", tree, step=4)

    recs = [json.loads(ln)
            for ln in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    hrec = recs[-1]["params_histograms(min,max,mean,std)"]
    assert hrec["params/dense/kernel"] == [0.0, 5.0, 2.5,
                                           hrec["params/dense/kernel"][3]]
    assert "params/dense/bias" in hrec
    metrics, step = stub.logged[-1]
    assert step == 4 and isinstance(metrics["params/dense/kernel"], _Hist)
