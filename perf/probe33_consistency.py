"""probe33: consistency distillation at flagship scale — quality vs steps.

Distills the protocol_hard teacher (flagship 64ch UNet, T=400, EMA weights)
into a consistency student on the hard 50k dataset, then measures the
student's 1/2/4-step samples with the SAME proxies as probe21/30 (pixel-FID
+ exp1-classifier-FID vs real hard data, 2048 images, generation timed) so
all sampler families are directly comparable on one axis:

    ancestral-400  /  DDIM-50  /  DPM++-15  /  consistency-4/2/1

The consistency rows use NO guidance pass (guidance is distilled in): a
k-step consistency sample costs k B-batch forwards where the others cost
steps x 2B.  Negative anchor: the UNDISTILLED teacher evaluated through the
same consistency parameterization at 1 step — if distillation didn't matter,
that row would match the student.

Usage: python perf/probe33_consistency.py [epochs]
Output: perf/probe33.json (+ consistency_model{,_ema}.msgpack under the
protocol_hard run dir)
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
EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 12

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


# ---------------------------------------------------------------- distill
train_ds = synthetic_dataset_hard(50000, 32, 3, seed=0)
loader = DataLoader(train_ds, config.batch_size, seed=config.seed)
trainer = ConsistencyDistillTrainer(
    config, model, diffusion, teacher, loader, list(range(10)),
    skip_steps=20, ema_decay=0.95,
)
print(f"distilling {EPOCHS} epochs x {len(train_ds) // config.batch_size} "
      "steps...", flush=True)
t0 = time.perf_counter()
res = trainer.train(EPOCHS)
distill_s = time.perf_counter() - t0
steps = int(trainer.state.step)
print(f"distilled: {steps} steps in {distill_s:.1f} s "
      f"({steps / distill_s:.1f} steps/s), loss {res['history'][0]:.4f} -> "
      f"{res['loss']:.4f}", flush=True)

classes = jnp.arange(B, dtype=jnp.int32) % 10


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


def gen_ddim(params, steps):
    fn = jax.jit(lambda p, k: diffusion.sample_ddim(
        model.apply, p, k, classes, (32, 32, 3), n_sample_steps=steps,
        cfg_scale=3.0, null_label=10))
    np.asarray(fn(params, jax.random.key(0)))
    imgs = []
    t0 = time.perf_counter()
    for i in range(N_FID // B):
        x0 = np.asarray(fn(params, jax.random.key(100 + i)))
        imgs.append(((np.clip(x0, -1, 1) + 1) * 127.5).astype(np.uint8))
    dt = time.perf_counter() - t0
    return np.concatenate(imgs), N_FID / dt


real = synthetic_dataset_hard(N_FID, 32, 3, seed=777).images
f_real = features(real)

out = {"device": str(jax.devices()[0]), "n": N_FID, "epochs": EPOCHS,
       "distill_steps": steps, "distill_s": round(distill_s, 1),
       "distill_steps_per_sec": round(steps / distill_s, 1),
       "loss_first_epoch": round(float(res["history"][0]), 5),
       "loss_last_epoch": round(float(res["loss"]), 5)}

teacher_dev = jax.device_put(teacher)
rows = [
    ("ddim50_teacher", lambda: gen_ddim(teacher_dev, 50)),
    ("consistency1", lambda: gen_consistency(trainer.state.ema_params, 1)),
    ("consistency2", lambda: gen_consistency(trainer.state.ema_params, 2)),
    ("consistency4", lambda: gen_consistency(trainer.state.ema_params, 4)),
    ("consistency1_undistilled", lambda: gen_consistency(teacher_dev, 1)),
]
for name, fn in rows:
    imgs, rate = fn()
    row = {
        "img_per_sec": round(rate, 1),
        "fid_pixel": round(pixel_fid(real, imgs), 4),
        "fid_classifier": round(fid_from_features(f_real, features(imgs)), 4),
    }
    out[name] = row
    print(name, row, flush=True)

name = "probe33.json" if EPOCHS == 12 else f"probe33_e{EPOCHS}.json"
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), name),
          "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out))
