"""Perf probe 16: trace the flagship TRAIN step (B=64, bf16, XLA attention —
the trainers' grad-path configuration) and rank op self-times from the chrome
trace.  Round-1 verdict estimated train MFU ~16%; find where the backward
goes.
"""

import collections
import glob
import gzip
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/runs/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")

from ldm_tpu.diffusion.ddpm import GaussianDiffusion
from ldm_tpu.models.unet import UNet

B = 64
T = 400
ITERS = 50
TRACE_DIR = "/root/repo/runs/trace_probe16"

model = UNet(in_channels=3, out_channels=3, channels=64,
             channel_multipliers=(1, 2, 4, 8), num_classes=10,
             dtype=jnp.bfloat16, attention_impl="xla")
diffusion = GaussianDiffusion(n_steps=T)
x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
params = jax.jit(model.init)(
    jax.random.key(0), x0, jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
tx = optax.adam(5e-4)
opt_state = tx.init(params)

imgs = jax.random.normal(jax.random.key(1), (B, 32, 32, 3), jnp.float32)
labels = jnp.arange(B, dtype=jnp.int32) % 10


def loss_fn(p, key):
    eps, xt, t = diffusion.noise_batch(key, imgs)
    pred = model.apply(p, xt, t, labels)
    return jnp.mean((pred.astype(jnp.float32) - eps) ** 2)


@jax.jit
def steps(params, opt_state, key):
    def one(carry, i):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(
            params, jax.random.fold_in(key, i))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss
    (params, opt_state), losses = jax.lax.scan(
        one, (params, opt_state), jnp.arange(ITERS))
    return params, opt_state, losses.mean()


out = steps(params, opt_state, jax.random.key(2))
jax.block_until_ready(out)
t0 = time.perf_counter()
out = steps(params, opt_state, jax.random.key(3))
jax.block_until_ready(out)
wall = time.perf_counter() - t0
print(f"train step: {wall / ITERS * 1e3:.3f} ms ({ITERS / wall:.1f} steps/s) @ B={B}",
      flush=True)

with jax.profiler.trace(TRACE_DIR):
    out = steps(params, opt_state, jax.random.key(4))
    jax.block_until_ready(out)

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
        if name.startswith("while"):
            continue
        agg[name] += e["dur"]
        cnt[name] += 1
        total += e["dur"]
print(f"non-while device time: {total / 1e3 / ITERS:.3f} ms/step busy", flush=True)
rows = []
for name, us in agg.most_common(35):
    rows.append({"op": name[:110], "ms_per_step": round(us / ITERS / 1e3, 4),
                 "pct": round(100 * us / total, 1), "count": cnt[name]})
    print(f"{us / ITERS / 1e3:8.4f} ms/step {100 * us / total:5.1f}% "
          f"x{cnt[name]:5d}  {name[:110]}", flush=True)
with open("/root/repo/perf/probe16.json", "w") as f:
    json.dump({"ms_per_step_wall": wall / ITERS * 1e3, "B": B,
               "ms_per_step_busy": total / 1e3 / ITERS, "top_ops": rows},
              f, indent=2)
print("done", flush=True)
