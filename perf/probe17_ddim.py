"""DDIM capability demo on the chip: few-step sampling from the protocol
run's trained EMA checkpoint.  Measures throughput at 10/20/50 steps and a
pixel-FID quality proxy vs the 400-step ancestral DDPM from the same weights
and vs the real (synthetic-dataset) images.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/runs/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")

from ldm_tpu.config import load_config
from ldm_tpu.data.datasets import synthetic_dataset
from ldm_tpu.factory import build_diffusion, build_model
from ldm_tpu.ops.fid import pixel_fid
from ldm_tpu.training import checkpoint as ckpt

cfg = load_config("configs/protocol_cifar10_scale.yaml")
diffusion = build_diffusion(cfg)
model = build_model(cfg)
B = 100
classes = jnp.arange(B, dtype=jnp.int32) % 10
shape = (32, 32, 3)
x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
template = jax.eval_shape(
    lambda: model.init(jax.random.key(0), x0, jnp.zeros((1,), jnp.int32),
                       jnp.zeros((1,), jnp.int32)))
template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
params = ckpt.load_params(
    "runs/pixel/protocol_cifar10_scale/checkpoints/diffusion_model_ema.msgpack",
    template)
# from_bytes returns HOST numpy arrays — without this, every jitted call
# re-uploads ~81 MB of params over the tunnel (~3.5 s/call measured)
params = jax.device_put(params)


@jax.jit
def ddpm(params, key):
    return diffusion.sample(model.apply, params, key, classes, shape,
                            cfg_scale=cfg.diffusion.cfg_scale,
                            null_label=model.null_label)


ref = np.asarray(ddpm(params, jax.random.key(0)), np.float32)
t0 = time.perf_counter()
np.asarray(ddpm(params, jax.random.key(1)))
ddpm_rate = B / (time.perf_counter() - t0)
print(f"DDPM T=400: {ddpm_rate:.1f} img/s", flush=True)

real = np.asarray(synthetic_dataset(500, 32, 3).images, np.float32)
real = real / 127.5 - 1.0  # match the sampler's [-1, 1] domain

out = {"ddpm_T400_img_per_s": round(ddpm_rate, 1)}
for steps in (10, 20, 50):
    f = jax.jit(lambda p, k, s=steps: diffusion.sample_ddim(
        model.apply, p, k, classes, shape, n_sample_steps=s, eta=0.0,
        cfg_scale=cfg.diffusion.cfg_scale, null_label=model.null_label))
    imgs = np.asarray(f(params, jax.random.key(2)), np.float32)  # compile
    t0 = time.perf_counter()
    imgs = np.asarray(f(params, jax.random.key(3)), np.float32)
    rate = B / (time.perf_counter() - t0)
    fid_vs_ddpm = pixel_fid(ref, imgs)
    fid_vs_real = pixel_fid(real, np.clip(imgs, -1, 1))
    out[f"ddim{steps}"] = {
        "img_per_s": round(rate, 1),
        "pixel_fid_vs_ddpm400": round(fid_vs_ddpm, 4),
        "pixel_fid_vs_real": round(fid_vs_real, 4),
    }
    print(f"DDIM {steps} steps: {rate:.1f} img/s, pixel-FID vs DDPM "
          f"{fid_vs_ddpm:.4f}, vs real {fid_vs_real:.4f}", flush=True)

out["ddpm_pixel_fid_vs_real"] = round(pixel_fid(real, np.clip(ref, -1, 1)), 4)
with open("/root/repo/perf/probe17_ddim.json", "w") as fj:
    json.dump(out, fj, indent=2)
print(json.dumps(out), flush=True)
