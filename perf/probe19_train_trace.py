"""probe19: trace the round-3 train step (B=64, bf16, auto_grads attention —
fused Pallas fwd + hand-written Pallas bwd at the tabled shapes) and group op
self-times, for the train-MFU roofline note (VERDICT r2 item 3).

Mirrors probe16 (the round-2 all-XLA trace) so the two tables diff cleanly.
Includes Adam + EMA via the real TrainState (probe16 used bare optax; EMA is
part of the production step and its stream belongs in the accounting).
"""

import collections
import glob
import gzip
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

from ldm_tpu.diffusion.ddpm import GaussianDiffusion  # noqa: E402
from ldm_tpu.models.unet import UNet  # noqa: E402
from ldm_tpu.training.state import TrainState, make_optimizer  # noqa: E402

B, T, ITERS = 64, 400, 50
TRACE_DIR = "/root/repo/runs/trace_probe19"

model = UNet(in_channels=3, out_channels=3, channels=64,
             channel_multipliers=(1, 2, 4, 8), num_classes=10,
             dtype=jnp.bfloat16, attention_impl="auto_grads")
diffusion = GaussianDiffusion(n_steps=T)
x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
params = jax.jit(model.init)(
    jax.random.key(0), x0, jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
state = TrainState.create(params, make_optimizer(5e-4), jax.random.key(1))
imgs = jnp.zeros((B, 32, 32, 3), jnp.float32)
labels = jnp.arange(B, dtype=jnp.int32) % 10


def step(state, _):
    key = state.step_key()
    k_noise, k_drop = jax.random.split(key)
    eps, xt, t = diffusion.noise_batch(k_noise, imgs)
    y = jnp.where(jax.random.bernoulli(k_drop, 0.1), jnp.int32(10), labels)

    def loss_fn(p):
        return jnp.mean((eps - model.apply(p, xt, t, y)) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    return state.apply_gradients(grads), loss


@jax.jit
def run(state):
    return jax.lax.scan(step, state, None, length=ITERS)


state, losses = run(state)
np.asarray(losses)
times = []
for _ in range(3):
    t0 = time.perf_counter()
    state, losses = run(state)
    np.asarray(losses)
    times.append(time.perf_counter() - t0)
wall = min(times)
print(f"train step: {wall / ITERS * 1e3:.3f} ms ({ITERS / wall:.1f} steps/s) "
      f"@ B={B} auto_grads", flush=True)

with jax.profiler.trace(TRACE_DIR):
    state, losses = run(state)
    np.asarray(losses)

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


def group_of(name: str) -> str:
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n or "pallas" in n:
        return "pallas attention (fwd+bwd kernels)"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "layout copies"
    if "convolution" in n or ("fusion" in n and "conv" in n) or "dot" in n:
        return "conv/matmul fusions"
    if "reduce" in n or "convert" in n:
        return "GroupNorm stats / reductions"
    if "multiply" in n or "add" in n or "subtract" in n:
        return "optimizer/elementwise (Adam+EMA)"
    if "scatter" in n or "select-and-scatter" in n:
        return "maxpool backward"
    if "slice" in n or "dynamic" in n or "gather" in n:
        return "slice/DMA"
    return "other"


groups = collections.Counter()
for name, us in agg.items():
    groups[group_of(name)] += us
print(f"non-while device time: {total / 1e3 / ITERS:.3f} ms/step busy", flush=True)
grows = []
for gname, us in groups.most_common():
    grows.append({"group": gname, "ms_per_step": round(us / ITERS / 1e3, 3),
                  "pct": round(100 * us / total, 1)})
    print(f"{us / ITERS / 1e3:8.3f} ms/step {100 * us / total:5.1f}%  {gname}",
          flush=True)
rows = []
for name, us in agg.most_common(35):
    rows.append({"op": name[:110], "ms_per_step": round(us / ITERS / 1e3, 4),
                 "pct": round(100 * us / total, 1), "count": cnt[name]})
with open("/root/repo/perf/probe19.json", "w") as f:
    json.dump({"ms_per_step_wall": wall / ITERS * 1e3, "B": B,
               "attention_impl": "auto_grads",
               "ms_per_step_busy": total / 1e3 / ITERS,
               "groups": grows, "top_ops": rows}, f, indent=2)
print("done", flush=True)
