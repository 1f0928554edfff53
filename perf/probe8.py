"""Perf probe 8: full flagship sampler with attention_impl auto (Pallas fused
blocks at every level) vs forced xla, after the slice-reduction kernel rework.

T=200 scan (scales linearly to the T=1000 headline); B sweep around the
throughput optimum.  Writes perf/probe8.json.
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

from ldm_tpu.diffusion.ddpm import GaussianDiffusion
from ldm_tpu.models.unet import UNet

T = 200
V5E_BF16_PEAK = 197e12

diffusion = GaussianDiffusion(n_steps=T)
x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)

results = {}
for impl in ("xla", None):  # None == auto
    model = UNet(in_channels=3, out_channels=3, channels=64,
                 channel_multipliers=(1, 2, 4, 8), num_classes=10,
                 dtype=jnp.bfloat16, attention_impl=impl)
    params = jax.jit(model.init)(
        jax.random.key(0), x0, jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32)
    )
    for batch in (32, 64, 128, 256):
        classes = jnp.arange(batch, dtype=jnp.int32) % 10

        def run(params, key):
            return diffusion.sample(model.apply, params, key, classes,
                                    (32, 32, 3), cfg_scale=3.0, null_label=10)

        jitted = jax.jit(run)
        compiled = jitted.lower(params, jax.random.key(0)).compile()
        ca = compiled.cost_analysis()
        flops = float(ca.get("flops", -1)) if ca else -1

        np.asarray(jitted(params, jax.random.key(0)))
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(jitted(params, jax.random.key(i + 1)))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        mfu = flops * T / dt / V5E_BF16_PEAK if flops > 0 else None
        if mfu and mfu > 1.0:
            mfu /= T
        key = f"{impl or 'auto'}_b{batch}"
        results[key] = {
            "img_per_s_T1000_equiv": round(batch / dt * (T / 1000), 2),
            "ms_per_step": round(dt / T * 1e3, 3),
            "mfu": round(mfu, 4) if mfu else None,
        }
        print(f"{key}: {results[key]}", flush=True)
        with open("/root/repo/perf/probe8.json", "w") as f:
            json.dump(results, f, indent=2)
print("done", flush=True)
