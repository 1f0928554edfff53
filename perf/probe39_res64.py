"""probe39: the reference's RESOLUTION axis — 64x64 / T=400 on the chip.

The reference's report (report.pdf §4, Figure 2) compares three
configurations: 32x32+T=400, 64x64+T=400, 32x32+T=1000.  Rounds 1-3 ran
everything at 32x32 (T=400 and T=1000 — probe21/bench); this reproduces the
missing 64x64/T=400 axis end to end on the TPU (VERDICT r3 item 2):

  1. train the flagship UNet (configs/protocol_hard_64.yaml: identical to
     protocol_hard.yaml except image_size 64, dataset 25k) on the hard
     synthetic at 64x64;
  2. train the exp1-style ResNet classifier on real 64x64 hard data (the
     protocol's feature space for classifier-FID);
  3. sample 2048 images with the protocol's two samplers (ancestral T=400,
     DDIM-50) and score pixel-FID + classifier-FID against real 64x64 data.

32x32 anchors for the cross-resolution comparison (same machinery,
perf/probe21.json): ddpm400 classifier-FID 0.98 / pixel-FID 0.33,
ddim50 1.34.  Note classifier-FIDs live in each resolution's own feature
space — the comparison is "how far from its own real data each
configuration lands", the report's framing, not a shared-space number.

Usage: python perf/probe39_res64.py [epochs]
Output: perf/probe39.json + checkpoints under runs/pixel/protocol_hard_64/
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
jax.config.update("jax_compilation_cache_dir", "/root/repo/runs/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from ldm_tpu.config import load_config  # noqa: E402
from ldm_tpu.data.datasets import synthetic_dataset_hard  # noqa: E402
from ldm_tpu.data.loader import DataLoader  # noqa: E402
from ldm_tpu.data.transforms import scale_to_minus_one_one  # noqa: E402
from ldm_tpu.factory import build_classifier, build_diffusion, build_model  # noqa: E402
from ldm_tpu.ops.fid import fid_from_features, pixel_fid  # noqa: E402
from ldm_tpu.training.diffusion_trainer import DiffusionTrainer  # noqa: E402
from ldm_tpu.training.resnet_trainer import ResNetTrainer  # noqa: E402

N_FID = 2048
B = 64  # sampling batch: 64px activations are 4x the 32px protocol's
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe39.json")

config = load_config("/root/repo/configs/protocol_hard_64.yaml")
if len(sys.argv) > 1:
    config.epochs = int(sys.argv[1])

# ------------------------------------------------------------ Phase A: train
n_total = config.data.synthetic_size
ds = synthetic_dataset_hard(n_total, 64, 3, seed=0)
n_val = int(n_total * config.data.val_split)
perm = np.random.default_rng(config.seed).permutation(n_total)
train_ds = ds.subset(perm[n_val:])
val_ds = ds.subset(perm[:n_val])

model = build_model(config)
diffusion = build_diffusion(config)
trainer = DiffusionTrainer(
    config, model, diffusion,
    DataLoader(train_ds, config.batch_size, seed=config.seed),
    DataLoader(val_ds, config.batch_size, seed=config.seed + 1),
    classes=list(range(10)),
)
print(f"training 64x64 UNet: {len(train_ds)} imgs, {config.epochs} epochs max",
      flush=True)
t0 = time.perf_counter()
hist = trainer.train()
train_s = time.perf_counter() - t0
steps = int(trainer.state.step)
print(f"trained: {steps} steps in {train_s:.1f}s ({steps / train_s:.1f} "
      f"steps/s), val {hist['val_loss'][-1]:.4f}", flush=True)

# -------------------------------------------- exp1 classifier (64px features)
import dataclasses  # noqa: E402

clf_cfg = dataclasses.replace(config, loss_fn="cross-entropy", epochs=8,
                              project_name=config.project_name + "_classifier")
clf_ds = synthetic_dataset_hard(n_total, 64, 3, seed=1)
clf_val = synthetic_dataset_hard(5000, 64, 3, seed=2, train=False)
clf = build_classifier(clf_cfg, 3, 10)
ctrainer = ResNetTrainer(
    clf_cfg, clf,
    DataLoader(clf_ds, clf_cfg.batch_size, seed=7),
    DataLoader(clf_val, clf_cfg.batch_size, seed=8),
    classes=list(range(10)), name="resnet64_exp1",
)
ctrainer.train()
feat_fn = jax.jit(lambda v, x: clf.apply(v, x, train=False, features=True))
cvars = {"params": ctrainer.state.params,
         "batch_stats": ctrainer.state.batch_stats}


def features(images_u8):
    x = scale_to_minus_one_one(images_u8)
    outs = []
    for i in range(0, len(x), 256):
        chunk = x[i : i + 256]
        if len(chunk) < 256:
            chunk = np.concatenate([chunk, x[: 256 - len(chunk)]])
        outs.append(np.asarray(feat_fn(cvars, jnp.asarray(chunk))))
    return np.concatenate(outs)[: len(x)]


real = synthetic_dataset_hard(N_FID, 64, 3, seed=777).images
f_real = features(real)

# --------------------------------------------------------- Phase C: sampling
out = {
    "device": str(jax.devices()[0]), "n": N_FID, "image_size": 64,
    "t": config.diffusion.n_steps,
    "train": {"steps": steps, "seconds": round(train_s, 1),
              "steps_per_sec": round(steps / train_s, 2),
              "epochs_run": len(hist["val_loss"]),
              "final_val_loss": round(hist["val_loss"][-1], 5)},
    "anchors_32px_probe21": {"ddpm400_fid_classifier": 0.98,
                             "ddpm400_fid_pixel": 0.33,
                             "ddim50_fid_classifier": 1.34},
}

classes = np.arange(B, dtype=np.int32) % 10
for name, method, steps_kw in [("ddpm400", "ddpm", {}),
                               ("ddim50", "ddim", {"ddim_steps": 50})]:
    imgs = []
    t0 = time.perf_counter()
    for i in range(N_FID // B):
        key = jax.random.fold_in(jax.random.key(777), i)
        imgs.append(trainer.sample(classes, cfg_scale=3.0, key=key,
                                   method=method, **steps_kw))
    dt = time.perf_counter() - t0
    imgs = np.concatenate(imgs)
    row = {
        "img_per_sec": round(N_FID / dt, 1),
        "fid_pixel": round(float(pixel_fid(real, imgs)), 4),
        "fid_classifier": round(
            float(fid_from_features(f_real, features(imgs))), 4),
    }
    out[name] = row
    print(name, row, flush=True)

with open(OUT, "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out))
