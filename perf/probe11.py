"""Perf probe 11: trace the flagship sampler (auto attention, 2B=256) and rank
XLA op self-times from the xplane proto (TF 2.21 is in the image, so the
tensorboard plugin isn't needed — parse tensorflow.core.profiler XSpace
directly).  VERDICT #1: find the remaining time sinks after Pallas-attention
adoption (bench mfu 0.378 at B=128).
"""

import collections
import glob
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

T = 50
B = 128
TRACE_DIR = "/root/repo/runs/trace_probe11"

diffusion = GaussianDiffusion(n_steps=T)
model = UNet(in_channels=3, out_channels=3, channels=64,
             channel_multipliers=(1, 2, 4, 8), num_classes=10,
             dtype=jnp.bfloat16)
x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
params = jax.jit(model.init)(
    jax.random.key(0), x0, jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
classes = jnp.arange(B, dtype=jnp.int32) % 10


@jax.jit
def run(params, key):
    return diffusion.sample(model.apply, params, key, classes, (32, 32, 3),
                            cfg_scale=3.0, null_label=10)


np.asarray(run(params, jax.random.key(0)))  # compile
t0 = time.perf_counter()
np.asarray(run(params, jax.random.key(1)))
wall = time.perf_counter() - t0
print(f"sampler: {wall / T * 1e3:.3f} ms/step @ 2B={2 * B}", flush=True)

with jax.profiler.trace(TRACE_DIR):
    np.asarray(run(params, jax.random.key(2)))

# ------------------------------------------------- parse the chrome trace JSON
# (the image's TF has no importable xplane proto; the .trace.json.gz carries
# the same per-op device timeline)
import gzip  # noqa: E402

tj = sorted(glob.glob(TRACE_DIR + "/**/*.trace.json.gz", recursive=True))[-1]
d = json.load(gzip.open(tj))
evs = d["traceEvents"]
threads = {}
for e in evs:
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        threads[(e["pid"], e["tid"])] = e["args"]["name"]
agg = collections.Counter()
cnt = collections.Counter()
total = 0.0
for e in evs:
    if e.get("ph") == "X" and threads.get((e["pid"], e["tid"])) == "XLA Ops":
        name = e["name"]
        if name.startswith("while"):  # the scan wrapper overlaps its body ops
            continue
        agg[name] += e["dur"]
        cnt[name] += 1
        total += e["dur"]
print(f"non-while device op time: {total / 1e3:.1f} ms -> "
      f"{total / 1e3 / T:.3f} ms/step busy")
rows = []
for name, us in agg.most_common(30):
    rows.append({"op": name[:110], "ms_per_step": round(us / T / 1e3, 4),
                 "pct": round(100 * us / total, 1), "count": cnt[name]})
    print(f"{us / T / 1e3:8.4f} ms/step {100 * us / total:5.1f}% "
          f"x{cnt[name]:5d}  {name[:110]}")
with open("/root/repo/perf/probe11.json", "w") as f:
    json.dump({"ms_per_step_wall": wall / T * 1e3, "2B": 2 * B,
               "ms_per_step_busy": total / 1e3 / T, "top_ops": rows},
              f, indent=2)
print("done", flush=True)
