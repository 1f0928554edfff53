"""Perf probe 2: ablation bisect of the sampler step at B=64 vs B=256.

Which block's cost grows superlinearly with batch?  Time the full T=100 scan
with components knocked out (identity monkeypatches — timing only, math bogus).
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

import ldm_tpu.models.unet as unet_mod
from ldm_tpu.diffusion.ddpm import GaussianDiffusion
from ldm_tpu.models.unet import UNet

T = 100


def build():
    model = UNet(in_channels=3, out_channels=3, channels=64,
                 channel_multipliers=(1, 2, 4, 8), num_classes=10,
                 dtype=jnp.bfloat16)
    diffusion = GaussianDiffusion(n_steps=T)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = jax.jit(model.init)(
        jax.random.key(0), x, jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    return model, diffusion, params


def time_sampler(model, diffusion, params, batch):
    classes = jnp.arange(batch, dtype=jnp.int32) % 10

    @jax.jit
    def run(params, key):
        return diffusion.sample(model.apply, params, key, classes, (32, 32, 3),
                                cfg_scale=3.0, null_label=10)

    np.asarray(run(params, jax.random.key(0)))
    times = []
    for i in range(2):
        t0 = time.perf_counter()
        np.asarray(run(params, jax.random.key(i + 1)))
        times.append(time.perf_counter() - t0)
    return min(times) / T * 1e3  # ms per step


class IdentityLinAttn(unet_mod.LinAttnBlock):
    @unet_mod.nn.compact
    def __call__(self, x):
        return x


class IdentityAttn(unet_mod.nn.Module):
    dtype: object = jnp.float32

    @unet_mod.nn.compact
    def __call__(self, x):
        return x


results = {}
ORIG = {"LinAttnBlock": unet_mod.LinAttnBlock, "Attention": unet_mod.Attention}

for name, patch in [
    ("full", {}),
    ("no_linattn", {"LinAttnBlock": IdentityLinAttn}),
    ("no_bottleneck_attn", {"Attention": IdentityAttn}),
    ("no_attn_at_all", {"LinAttnBlock": IdentityLinAttn,
                        "Attention": IdentityAttn}),
]:
    for k, v in patch.items():
        setattr(unet_mod, k, v)
    try:
        model, diffusion, params = build()
        results[name] = {}
        for b in (64, 256):
            ms = time_sampler(model, diffusion, params, b)
            results[name][b] = round(ms, 3)
            print(name, b, round(ms, 3), "ms/step", flush=True)
    finally:
        for k, v in ORIG.items():
            setattr(unet_mod, k, v)

with open("/root/repo/perf/probe2.json", "w") as f:
    json.dump(results, f, indent=2)
print(json.dumps(results))
