"""probe23: latent-diffusion quality on the HARD dataset, CALIBRATED scaling.

probe22 measured the latent family with Stable Diffusion's hardcoded
latent_scaling_factor=0.18215 (the reference's constant,
src/LatentDiffusionModel.py:28): classifier-FID 5.98 against the VAE's own
reconstruction ceiling of 0.28, because this VAE's latents have std ~1.0 and
the SD constant shrank the diffusion signal 5.5x below the noise scale.
This probe re-measures after `latent_scaling_factor: auto` (1/std calibration,
models/latent.py) and retraining — same sweeps, same metric machinery.

Usage: python perf/probe23_latent_quality_calibrated.py [out.json]
(probe23.json = calibrated scaling at the original T=400 config;
probe24.json = + the T=1000 schedule fix, see configs/latent_diffusion_hard.yaml)
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
from ldm_tpu.data.loader import create_dataloaders  # noqa: E402
from ldm_tpu.data.transforms import scale_to_minus_one_one  # noqa: E402
from ldm_tpu.factory import build_classifier, build_model, compute_dtype  # noqa: E402
from ldm_tpu.models.latent import LatentDiffusionModel  # noqa: E402
from ldm_tpu.ops.fid import fid_from_features, pixel_fid  # noqa: E402
from ldm_tpu.registry import instantiate_from_config  # noqa: E402
from ldm_tpu.training import checkpoint as ckpt  # noqa: E402
from ldm_tpu.training.latent_trainer import (  # noqa: E402
    latent_shape_of, resolve_latent_scaling,
)

N_FID = 2048
B = 128

config = load_config("/root/repo/configs/latent_diffusion_hard.yaml")
ae = instantiate_from_config(
    {"target": config.autoencoder.target, "params": config.autoencoder.params},
    dtype=compute_dtype(config),
)
d = config.data
ae_tmpl = jax.eval_shape(
    ae.init, jax.random.key(0),
    jnp.zeros((1, d.image_size, d.image_size, d.image_channels)),
    jax.random.key(1),
)
ae_tmpl = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), ae_tmpl)
ae_params = jax.device_put(ckpt.load_params(config.ae_checkpoint, ae_tmpl))

# resolve the scaling EXACTLY like the training script (same data, same key)
train_loader, _, _, _ = create_dataloaders(config)
scaling = resolve_latent_scaling(config, ae, ae_params, train_loader)
print(f"resolved latent_scaling_factor = {scaling:.5f}", flush=True)

model = build_model(config)
dc = config.diffusion
ldm = LatentDiffusionModel(
    eps_model=model, autoencoder=ae, latent_scaling_factor=scaling,
    n_steps=dc.n_steps, linear_start=dc.beta_start, linear_end=dc.beta_end,
)
z_shape = latent_shape_of(ae, d.image_size)

tmpl = jax.eval_shape(
    model.init, jax.random.key(0), jnp.zeros((1,) + z_shape),
    jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
)
tmpl = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), tmpl)
ckpt_path = (sys.argv[2] if len(sys.argv) > 2 else
             "/root/repo/runs/latent/latent_diffusion_hard/checkpoints/"
             "diffusion_model_ema.msgpack")
params = jax.device_put(ckpt.load_params(ckpt_path, tmpl))

pcfg = load_config("/root/repo/configs/protocol_hard.yaml")
clf = build_classifier(pcfg, 3, 10)
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
null_label = model.num_classes


def gen(method, steps, cfg_scale):
    if method == "ddim":
        def sample_fn(p, k):
            z0 = ldm.diffusion.sample_ddim(
                model.apply, p, k, classes, z_shape, n_sample_steps=steps,
                cfg_scale=cfg_scale, null_label=null_label)
            return ldm.autoencoder_decode(ae_params, z0)
    else:
        def sample_fn(p, k):
            z0 = ldm.diffusion.sample(
                model.apply, p, k, classes, z_shape,
                cfg_scale=cfg_scale, null_label=null_label)
            return ldm.autoencoder_decode(ae_params, z0)
    fn = jax.jit(sample_fn)
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

out = {"device": str(jax.devices()[0]), "n": N_FID,
       "latent_shape": list(z_shape), "latent_scaling_factor": scaling}

recon_fn = jax.jit(lambda k, x: ldm.autoencoder_decode(
    ae_params, ldm.autoencoder_encode(ae_params, k, x)))
recons = []
xr = scale_to_minus_one_one(real)
for i in range(0, N_FID, B):
    r = np.asarray(recon_fn(jax.random.key(i), jnp.asarray(xr[i : i + B])))
    recons.append(((np.clip(r, -1, 1) + 1) * 127.5).astype(np.uint8))
recons = np.concatenate(recons)
out["vae_reconstruction_ceiling"] = {
    "fid_pixel": round(pixel_fid(real, recons), 4),
    "fid_classifier": round(fid_from_features(f_real, features(recons)), 4),
}
print("vae_reconstruction_ceiling", out["vae_reconstruction_ceiling"], flush=True)

grid_imgs = None
ancestral_name = f"latent_ancestral_T{dc.n_steps}"
for name, method, steps, cfg in [
    (ancestral_name, "ddpm", None, 3.0),
    ("latent_ddim50", "ddim", 50, 3.0),
    ("latent_ddim5_cfg0", "ddim", 5, 0.0),
]:
    imgs, rate = gen(method, steps, cfg)
    if name == ancestral_name:
        grid_imgs = imgs
    row = {
        "img_per_sec": round(rate, 1),
        "fid_pixel": round(pixel_fid(real, imgs), 4),
        "fid_classifier": round(
            fid_from_features(f_real, features(imgs)), 4),
    }
    out[name] = row
    print(name, row, flush=True)

# per-class sample grid for the docs (8 per class, classes as rows)
from ldm_tpu.utils.images import image_grid, save_images  # noqa: E402

cls = np.asarray(classes)
rows = [grid_imgs[np.flatnonzero(cls == c)[:8]] for c in range(10)]
save_images([image_grid(np.concatenate(rows), cols=8)],
            ["/root/repo/docs/sample_grid_latent_hard.png"])

out_name = sys.argv[1] if len(sys.argv) > 1 else "probe23.json"
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       out_name), "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out))
