"""probe30: DPM-Solver++(2M) quality/speed curve vs DDIM on the HARD dataset.

Same protocol as perf/probe21_ddim_quality_hard.py (2048 images per setting,
pixel-FID + exp1-classifier-FID against real hard data, generation timed),
from the SAME protocol_hard EMA weights and exp1 classifier — so the rows are
directly comparable with probe21.json.

The claim under test: the second-order multistep sampler on the uniform-lambda
grid (ddpm.py sample_dpmpp) reaches DDIM-50-class classifier-FID at ~10-15
model evals — i.e. another ~2-4x sampling-throughput step at held quality.
DDIM-50 and DDIM-10 are re-measured in-run as anchors (the checkpoint is a
deterministic re-train; anchors guard against any drift vs probe21).

Usage: python perf/probe30_dpmpp_quality.py
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
from ldm_tpu.data.transforms import scale_to_minus_one_one  # noqa: E402
from ldm_tpu.diffusion.ddpm import GaussianDiffusion  # noqa: E402
from ldm_tpu.factory import build_classifier, build_model  # noqa: E402
from ldm_tpu.ops.fid import fid_from_features, pixel_fid  # noqa: E402
from ldm_tpu.training import checkpoint as ckpt  # noqa: E402

N_FID = 2048
B = 128

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
params = jax.device_put(ckpt.load_params(
    "/root/repo/runs/pixel/protocol_hard/checkpoints/diffusion_model_ema.msgpack",
    tmpl,
))

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


def gen(method, steps, cfg_scale, order=2):
    if method == "dpmpp":
        fn = jax.jit(lambda p, k: diffusion.sample_dpmpp(
            model.apply, p, k, classes, (32, 32, 3), n_sample_steps=steps,
            cfg_scale=cfg_scale, null_label=10, order=order))
    else:
        fn = jax.jit(lambda p, k: diffusion.sample_ddim(
            model.apply, p, k, classes, (32, 32, 3), n_sample_steps=steps,
            cfg_scale=cfg_scale, null_label=10))
    imgs = []
    np.asarray(fn(params, jax.random.key(0)))  # compile
    t0 = time.perf_counter()
    for i in range(N_FID // B):
        x0 = np.asarray(fn(params, jax.random.key(100 + i)))
        imgs.append(((np.clip(x0, -1, 1) + 1) * 127.5).astype(np.uint8))
    dt = time.perf_counter() - t0
    return np.concatenate(imgs), N_FID / dt


real = synthetic_dataset_hard(N_FID, 32, 3, seed=777).images
f_real = features(real)

out = {"device": str(jax.devices()[0]), "n": N_FID}
for name, method, steps, cfg, order in [
    ("ddim50", "ddim", 50, 3.0, 2),        # anchor (probe21: 1.2853)
    ("ddim10", "ddim", 10, 3.0, 2),        # anchor (probe21: 1.375)
    ("dpmpp20", "dpmpp", 20, 3.0, 2),
    ("dpmpp15", "dpmpp", 15, 3.0, 2),
    ("dpmpp10", "dpmpp", 10, 3.0, 2),
    ("dpmpp8", "dpmpp", 8, 3.0, 2),
    ("dpmpp5", "dpmpp", 5, 3.0, 2),
    ("dpmpp10_order1", "dpmpp", 10, 3.0, 1),  # grid-only ablation
]:
    imgs, rate = gen(method, steps, cfg, order)
    row = {
        "img_per_sec": round(rate, 1),
        "fid_pixel": round(pixel_fid(real, imgs), 4),
        "fid_classifier": round(
            fid_from_features(f_real, features(imgs)), 4),
    }
    out[name] = row
    print(name, row, flush=True)

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "probe30.json"), "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out))
