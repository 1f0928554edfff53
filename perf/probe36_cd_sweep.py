"""probe36: consistency-distillation recipe sweep (VERDICT r3 item 3).

Round 3's single CD run (perf/probe33.json: skip 20, EMA 0.95, 12 epochs,
lr = config.lr) landed consistency-2 classifier-FID 1.62 vs the DDIM-50
teacher's 1.34 and "the typical CD quality gap" was accepted without a
sweep.  This is the systematic pass: one-factor-at-a-time around that
baseline, each arm measured with the probe33 protocol (2048 images,
pixel-FID + exp1-classifier-FID vs real hard data) at 2 and 4 steps.

Target: consistency-2 classifier-FID <= 1.45.  If no arm reaches it, the
sweep IS the committed negative result pinning the gap as structural at
this scale.

Arms (baseline = probe33's recipe):
  budget24  2x distill budget (24 epochs)           — "more training"
  ema99     slower target EMA (0.99)                — CM paper large-data
  skip10    finer boundary segments (skip 10)       — tighter ODE match
  lr2e4     lower distill lr (2e-4 vs 5e-4)         — late-training drift

Usage: python perf/probe36_cd_sweep.py [arm ...]   (default: all arms)
Merges results incrementally into perf/probe36.json so arms can run in
separate invocations.
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
from ldm_tpu.diffusion.consistency import sample_consistency  # noqa: E402
from ldm_tpu.diffusion.ddpm import GaussianDiffusion  # noqa: E402
from ldm_tpu.factory import build_classifier, build_model  # noqa: E402
from ldm_tpu.ops.fid import fid_from_features, pixel_fid  # noqa: E402
from ldm_tpu.training import checkpoint as ckpt  # noqa: E402
from ldm_tpu.training.consistency_trainer import (  # noqa: E402
    ConsistencyDistillTrainer,
    sampling_timesteps,
)

N_FID = 2048
B = 128
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe36.json")

ARMS = {
    # the probe33 recipe verbatim, rerun on THIS teacher instance — the
    # control that separates recipe effects from the teacher/classifier
    # retrain's FID-scale shift
    "baseline12": dict(epochs=12, ema_decay=0.95, skip_steps=20, lr=None),
    "budget24": dict(epochs=24, ema_decay=0.95, skip_steps=20, lr=None),
    "ema99": dict(epochs=12, ema_decay=0.99, skip_steps=20, lr=None),
    "skip10": dict(epochs=12, ema_decay=0.95, skip_steps=10, lr=None),
    "lr2e4": dict(epochs=12, ema_decay=0.95, skip_steps=20, lr=2e-4),
    # combined best-shot: the CM-paper pairing of a longer budget with a
    # slower target EMA + a lower lr for late-distill stability — the arm
    # to run first when the round budget only fits one
    "best24": dict(epochs=24, ema_decay=0.99, skip_steps=20, lr=2e-4),
    # best24 repeated with the same spec: a run-to-run variance bar for the
    # whole distill+FID pipeline, and the saved student for serving probes
    "best24b": dict(epochs=24, ema_decay=0.99, skip_steps=20, lr=2e-4),
}
chosen = sys.argv[1:] or list(ARMS)

config = load_config("/root/repo/configs/protocol_hard.yaml")
model = build_model(config)
diffusion = GaussianDiffusion(
    n_steps=config.diffusion.n_steps, schedule=config.diffusion.schedule,
    beta_start=config.diffusion.beta_start, beta_end=config.diffusion.beta_end,
)

tmpl = jax.eval_shape(
    model.init, jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
    jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
)
tmpl = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), tmpl)
teacher = ckpt.load_params(
    "/root/repo/runs/pixel/protocol_hard/checkpoints/diffusion_model_ema.msgpack",
    tmpl,
)

clf = build_classifier(config, 3, 10)
cv = jax.jit(lambda k, x: clf.init(k, x, train=False))(
    jax.random.key(1), jnp.zeros((1, 32, 32, 3))
)
ctmpl = {"params": jax.tree.map(np.asarray, cv["params"]),
         "batch_stats": jax.tree.map(np.asarray, cv.get("batch_stats", {}))}
cvars = jax.device_put(ckpt.load_params(
    "/root/repo/runs/pixel/protocol_hard_classifier/checkpoints/resnet_exp1.msgpack",
    ctmpl,
))
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


classes = jnp.arange(B, dtype=jnp.int32) % 10


def gen_ddim(params, steps):
    fn = jax.jit(lambda p, k: diffusion.sample_ddim(
        model.apply, p, k, classes, (32, 32, 3), n_sample_steps=steps,
        cfg_scale=3.0, null_label=10))
    np.asarray(fn(params, jax.random.key(0)))  # compile
    imgs = []
    t0 = time.perf_counter()
    for i in range(N_FID // B):
        x0 = np.asarray(fn(params, jax.random.key(100 + i)))
        imgs.append(((np.clip(x0, -1, 1) + 1) * 127.5).astype(np.uint8))
    dt = time.perf_counter() - t0
    return np.concatenate(imgs), N_FID / dt


def gen_consistency(params, n_steps_sample):
    ts = sampling_timesteps(diffusion.n_steps, n_steps_sample)
    fn = jax.jit(lambda p, k: sample_consistency(
        diffusion, model.apply, p, k, classes, (32, 32, 3), ts=ts))
    np.asarray(fn(params, jax.random.key(0)))  # compile
    imgs = []
    t0 = time.perf_counter()
    for i in range(N_FID // B):
        x0 = np.asarray(fn(params, jax.random.key(100 + i)))
        imgs.append(((np.clip(x0, -1, 1) + 1) * 127.5).astype(np.uint8))
    dt = time.perf_counter() - t0
    return np.concatenate(imgs), N_FID / dt


real = synthetic_dataset_hard(N_FID, 32, 3, seed=777).images
f_real = features(real)

out = {}
if os.path.exists(OUT):
    with open(OUT) as f:
        out = json.load(f)
out.setdefault("device", str(jax.devices()[0]))
out.setdefault("n", N_FID)
out.setdefault("baseline_probe33", {
    "recipe": "epochs=12 ema=0.95 skip=20 lr=config",
    "consistency2_fid_classifier": 1.6185,
    "consistency4_fid_classifier": 1.534,
    "teacher_ddim50_fid_classifier": 1.3353,
})

train_ds = synthetic_dataset_hard(50000, 32, 3, seed=0)

# Anchor: the CURRENT teacher's DDIM-50 quality.  The probe33 baseline
# numbers come from the round-3 teacher instance (lost checkpoints); the
# probe36_prep retrain follows the same recipe but is a different draw, so
# every arm must be read against THIS teacher's anchor, not probe33's.
if "teacher_ddim50" not in out:
    print("--- teacher anchor: DDIM-50", flush=True)
    imgs, rate = gen_ddim(jax.device_put(teacher), 50)
    out["teacher_ddim50"] = {
        "img_per_sec": round(rate, 1),
        "fid_pixel": round(float(pixel_fid(real, imgs)), 4),
        "fid_classifier": round(
            float(fid_from_features(f_real, features(imgs))), 4),
    }
    print("teacher_ddim50", out["teacher_ddim50"], flush=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)

for arm in chosen:
    spec = ARMS[arm]
    print(f"--- arm {arm}: {spec}", flush=True)
    loader = DataLoader(train_ds, config.batch_size, seed=config.seed)
    trainer = ConsistencyDistillTrainer(
        config, model, diffusion, teacher, loader, list(range(10)),
        skip_steps=spec["skip_steps"], ema_decay=spec["ema_decay"],
        lr=spec["lr"],
    )
    t0 = time.perf_counter()
    res = trainer.train(spec["epochs"])
    distill_s = time.perf_counter() - t0
    row = {"spec": {k: v for k, v in spec.items()},
           "distill_s": round(distill_s, 1),
           "loss_first": round(res["history"][0], 5),
           "loss_last": round(res["loss"], 5)}
    for k in (2, 4):
        imgs, rate = gen_consistency(trainer.state.ema_params, k)
        row[f"consistency{k}"] = {
            "img_per_sec": round(rate, 1),
            "fid_pixel": round(float(pixel_fid(real, imgs)), 4),
            "fid_classifier": round(
                float(fid_from_features(f_real, features(imgs))), 4),
        }
    ckpt.save_params(
        f"/root/repo/runs/pixel/protocol_hard/checkpoints/consistency_{arm}.msgpack",
        trainer.state.ema_params,
    )
    out[arm] = row
    print(arm, row, flush=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)

print(json.dumps(out))
