"""Real-data drill (VERDICT round 2, next-round item 6): the full `main.py`
protocol must run from RAW DATASET FILES ON DISK with `--strict-data` and zero
code edits — proving that dropping real MNIST/CIFAR files into `data/` is all
a user needs (reference src/AbstractDataset.py:28-55; main.py:96-135).

This drives the actual CLI entry (argv → main.main()), not just the loaders:
fabricated full-format MNIST IDX files → strict loading → Phase A diffusion
training → Phase C generation → exp1..exp5 classifier mixes → JSON result,
at debugging scale (20 samples, tiny UNet) so it stays CPU-viable."""

import gzip
import json
import struct
import sys

import numpy as np
import pytest
import yaml


def _write_mnist(root, n_train=64, n_test=16, rows=28, cols=28, seed=0):
    raw = root / "MNIST" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(seed)

    def write(prefix, n, gz_labels=False):
        images = rng.integers(0, 256, size=(n, rows, cols), dtype=np.uint8)
        labels = (np.arange(n) % 10).astype(np.uint8)
        with open(raw / f"{prefix}-images-idx3-ubyte", "wb") as f:
            f.write(struct.pack(">IIII", 2051, n, rows, cols))
            f.write(images.tobytes())
        opener = gzip.open if gz_labels else open
        suffix = ".gz" if gz_labels else ""
        with opener(raw / f"{prefix}-labels-idx1-ubyte{suffix}", "wb") as f:
            f.write(struct.pack(">II", 2049, n))
            f.write(labels.tobytes())

    write("train", n_train)
    write("t10k", n_test, gz_labels=True)  # the reader must handle .gz too


@pytest.mark.slow
def test_main_protocol_from_raw_files_strict(tmp_path, monkeypatch, capsys):
    _write_mnist(tmp_path / "data")

    cfg = {
        "project_name": "drill",
        "type": "pixel",
        # debugging=False: the reference's 20-sample truncation leaves the
        # protocol's 90/10 val split empty at batch 2 — use the full 64
        # fabricated samples instead (still tiny)
        "debugging": False,
        "batch_size": 2,
        "epochs": 1,
        "lr": 5e-4,
        "use_amp": False,
        "loss_fn": "mse",
        "early_stopping_patience": 2,
        "workdir": str(tmp_path / "runs"),
        "sample_every": 0,
        "diffusion": {"type": "pixel", "cfg_scale": 3,
                      "params": {"n_steps": 8, "n_samples": 4}},
        "model": {"target": "ldm_tpu.models.unet.UNet",
                  "params": {"in_channels": 1, "out_channels": 1,
                             "channels": 8, "channel_multipliers": [1, 2],
                             "num_classes": 10}},
        "data": {"dataset": "MNIST", "image_channels": 1, "image_size": 16,
                 "val_split": 0.1, "data_path": str(tmp_path / "data")},
    }
    cfg_path = tmp_path / "drill.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    sys.path.insert(0, "/root/repo")
    import main as main_mod

    monkeypatch.setattr(sys, "argv", [
        "main.py", str(cfg_path), "--cpu", "--strict-data",
        "--per-class", "2", "--classifier-epochs", "1",
        "--sampler", "ddim", "--ddim-steps", "4",
    ])
    main_mod.main()

    out = capsys.readouterr().out
    result = json.loads(out[out.index("{"):])
    assert set(result["test_f1"]) == {"exp1", "exp2", "exp3", "exp4", "exp5"}
    assert result["synthetic_size"] == 20  # --per-class 2 x 10 classes
    assert np.isfinite(result["fid_pixel"])
    run_dir = tmp_path / "runs" / "pixel" / "drill"
    assert (run_dir / "metrics.jsonl").exists()

    # strict mode actually bites: remove the files and the same argv must fail
    import shutil

    shutil.rmtree(tmp_path / "data")
    with pytest.raises(FileNotFoundError):
        main_mod.main()
