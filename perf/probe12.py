"""Perf probe 12: per-level attention-impl mixes, end to end.

The probe11 trace shows ~1.0 ms/step of layout copies at 2B=256 around the
Pallas custom calls at the 32x32 (C=64) level: XLA lays conv data out
batch-in-lanes ({0,3,2,1}) at C=64 — full 128-lane MXU utilization for the
convs — but the custom call demands the default {3,2,1,0}, so transposes
bracket each L0 attention block.  Isolated per-block probes (probe7b/7c)
never saw this cost.  Question: which per-level pallas/xla assignment wins
end to end?

Monkeypatches ops.linear_attention.prefer_pallas — with the default
``impl="auto"`` every LinAttnBlock consults it exactly once at trace time, in
call order (4 encoder blocks L0..L3, then 4 decoder blocks), so returning a
per-call-site True/False sequence assigns impls per level.
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

T = 200
B = 128

import ldm_tpu.ops.linear_attention as la_mod

# pallas-enabled (N, C) set, swapped per experiment (None == real table)
IMPLS = {"shapes": None}
_real_prefer_pallas = la_mod.prefer_pallas


def shape_prefer_pallas(b, n, c, dtype):
    if not _real_prefer_pallas(b, n, c, dtype):
        return False  # untabled shape / CPU — the kernel has no entry anyway
    if IMPLS["shapes"] is None:
        return True
    return (n, c) in IMPLS["shapes"]


la_mod.prefer_pallas = shape_prefer_pallas


def build():
    model = UNet(in_channels=3, out_channels=3, channels=64,
                 channel_multipliers=(1, 2, 4, 8), num_classes=10,
                 dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = jax.jit(model.init)(
        jax.random.key(0), x0, jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32))
    return model, params


def sampler_rate(model, params, shapes):
    IMPLS["shapes"] = shapes
    diffusion = GaussianDiffusion(n_steps=T)
    classes = jnp.arange(B, dtype=jnp.int32) % 10

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
    sec = min(times)
    return B / (sec * 1000 / T)  # img/s at T=1000-equivalent


model, params = build()

L0, L1, L2, L3 = (1024, 64), (256, 128), (64, 256), (16, 512)
MIXES = {
    "all_pallas": None,                      # real table (current default)
    "all_xla": set(),
    "xla_at_L0": {L1, L2, L3},               # pallas except the big-N level
    "pallas_at_L0_only": {L0},
    "xla_at_L0L1": {L2, L3},
}
results = {}
for name, shapes in MIXES.items():
    rate = sampler_rate(model, params, shapes)
    results[name] = round(rate, 2)
    print(f"{name:20s}: {rate:.2f} img/s", flush=True)

la_mod.prefer_pallas = _real_prefer_pallas
with open("/root/repo/perf/probe12.json", "w") as f:
    json.dump({"B": B, "T": T, "img_per_sec": results}, f, indent=2)
print("done", flush=True)
