"""Perf probe 1: sampler throughput vs batch + XLA cost analysis (MFU).

Diagnoses the round-1 B=128 regression (BENCH_r01.json per_batch: 64->17.7,
128->15.2 img/s) and establishes the FLOP-based MFU number for bench.py.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

_cache_dir = "/root/repo/runs/.jax_cache"
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import sys

sys.path.insert(0, "/root/repo")

from ldm_tpu.diffusion.ddpm import GaussianDiffusion
from ldm_tpu.models.unet import UNet

T = 200  # enough steps to amortize; scales linearly to T=1000

model = UNet(in_channels=3, out_channels=3, channels=64,
             channel_multipliers=(1, 2, 4, 8), num_classes=10,
             dtype=jnp.bfloat16)
diffusion = GaussianDiffusion(n_steps=T)
x = jnp.zeros((1, 32, 32, 3), jnp.float32)
params = jax.jit(model.init)(
    jax.random.key(0), x, jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32)
)

V5E_BF16_PEAK = 197e12

results = {}
for batch in (32, 64, 96, 128, 192, 256):
    classes = jnp.arange(batch, dtype=jnp.int32) % 10

    def run(params, key):
        return diffusion.sample(model.apply, params, key, classes, (32, 32, 3),
                                cfg_scale=3.0, null_label=10)

    jitted = jax.jit(run)
    lowered = jitted.lower(params, jax.random.key(0))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    flops = float(ca.get("flops", -1)) if ca else -1

    np.asarray(jitted(params, jax.random.key(0)))
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        np.asarray(jitted(params, jax.random.key(i + 1)))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    imgs_per_sec = batch / dt
    mfu = flops / dt / V5E_BF16_PEAK if flops > 0 else None
    results[batch] = {
        "imgs_per_sec_T200": round(imgs_per_sec, 2),
        "imgs_per_sec_T1000_equiv": round(imgs_per_sec / 5, 2),
        "sec_per_step": dt / T,
        "flops_total": flops,
        "flops_per_img_per_step": flops / T / batch if flops > 0 else None,
        "mfu": round(mfu, 4) if mfu else None,
    }
    print(batch, json.dumps(results[batch]), flush=True)

with open("/root/repo/perf/probe1.json", "w") as f:
    json.dump(results, f, indent=2)
