"""probe39b: resume the 64x64/T=400 axis from the trained checkpoint.

The probe39 session died after the diffusion phase finished (17550 steps,
1330.0 s, val 0.1245 — /tmp/probe39.log) but before the classifier/sampling
phases.  The full best TrainState is on disk
(runs/pixel/protocol_hard_64/checkpoints/best_state.msgpack), so this script
re-runs only phases B (exp1 classifier at 64px) and C (sample 2048 with
ancestral-T400 + DDIM-50, score pixel-FID + classifier-FID) and writes the
same perf/probe39.json the original would have.

Train-phase numbers below are transcribed from the completed phase-A run.
"""

import dataclasses
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

N_FID = 2048
B = 64
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe39.json")
CKPT = "/root/repo/runs/pixel/protocol_hard_64/checkpoints/best_state.msgpack"

config = load_config("/root/repo/configs/protocol_hard_64.yaml")

n_total = config.data.synthetic_size
ds = synthetic_dataset_hard(n_total, 64, 3, seed=0)
n_val = int(n_total * config.data.val_split)
perm = np.random.default_rng(config.seed).permutation(n_total)

model = build_model(config)
diffusion = build_diffusion(config)
trainer = DiffusionTrainer(
    config, model, diffusion,
    DataLoader(ds.subset(perm[n_val:]), config.batch_size, seed=config.seed),
    DataLoader(ds.subset(perm[:n_val]), config.batch_size, seed=config.seed + 1),
    classes=list(range(10)),
)
trainer.load_state(CKPT)
print(f"restored best TrainState from {CKPT} (step {int(trainer.state.step)})",
      flush=True)

# -------------------------------------------- exp1 classifier (64px features)
# Trained to completion by the first probe39b attempt (8 epochs, best val-F1
# checkpointed at runs/pixel/protocol_hard_64_classifier/); load the best
# weights instead of retraining.
from ldm_tpu.training import checkpoint as ckpt  # noqa: E402

clf_cfg = dataclasses.replace(config, loss_fn="cross-entropy", epochs=8,
                              project_name=config.project_name + "_classifier")
clf = build_classifier(clf_cfg, 3, 10)
cv = jax.jit(lambda k, x: clf.init(k, x, train=False))(
    jax.random.key(1), jnp.zeros((1, 64, 64, 3)))
ctmpl = {"params": jax.tree.map(np.asarray, cv["params"]),
         "batch_stats": jax.tree.map(np.asarray, cv.get("batch_stats", {}))}
cvars = jax.device_put(ckpt.load_params(
    "/root/repo/runs/pixel/protocol_hard_64_classifier/checkpoints/"
    "resnet64_exp1.msgpack", ctmpl))
print("loaded resnet64_exp1 classifier checkpoint", flush=True)
feat_fn = jax.jit(lambda v, x: clf.apply(v, x, train=False, features=True))


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
    # phase A completed in the original probe39 session (/tmp/probe39.log):
    "train": {"steps": 17550, "seconds": 1330.0, "steps_per_sec": 13.2,
              "scan_steps_per_sec": 32.7, "epochs_run": 50,
              "final_val_loss": 0.1245,
              "note": "phase A from the original probe39 run; this file was "
                      "produced by probe39b_res64_resume.py from its "
                      "best_state.msgpack"},
    "classifier": {"name": "resnet64_exp1", "epochs": 8,
                   "best_valid_f1": 0.6863, "best_valid_loss": 0.7244},
    "anchors_32px_probe21": {"ddpm400_fid_classifier": 0.98,
                             "ddpm400_fid_pixel": 0.33,
                             "ddim50_fid_classifier": 1.34},
}

classes = np.arange(B, dtype=np.int32) % 10
for name, method, steps_kw in [("ddpm400", "ddpm", {}),
                               ("ddim50", "ddim", {"ddim_steps": 50})]:
    imgs = []
    # warm compile outside the timed loop
    _ = np.asarray(trainer.sample(classes, cfg_scale=3.0,
                                  key=jax.random.key(0), method=method,
                                  **steps_kw))
    t0 = time.perf_counter()
    for i in range(N_FID // B):
        key = jax.random.fold_in(jax.random.key(777), i)
        imgs.append(trainer.sample(classes, cfg_scale=3.0, key=key,
                                   method=method, **steps_kw))
    imgs = [np.asarray(x) for x in imgs]
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
