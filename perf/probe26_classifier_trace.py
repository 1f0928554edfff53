"""probe26: trace the classifier train step (the protocol's dominant phase —
ResNet-18 shape, B=64, bf16 compute, reference main.py:75-87 arch) and group
XLA op self-times, mirroring probe19's methodology for the diffusion step.

Motivation: classifier training is ~2/3 of protocol wall-clock and its bench
MFU (~0.30) has no committed breakdown — is it MXU-bound (done) or is there a
bandwidth bucket worth attacking (BatchNorm stats, layout copies around the
strided stem, the fp32 optimizer stream)?
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
import optax

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
jax.config.update("jax_compilation_cache_dir", "/root/repo/runs/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from ldm_tpu.models.resnet import ResNetBase  # noqa: E402
from ldm_tpu.training.state import TrainState, make_optimizer  # noqa: E402

B, ITERS = 64, 50
TRACE_DIR = "/root/repo/runs/trace_probe26"

model = ResNetBase(img_channels=3, out_channels=10, n_blocks=(2, 2, 2, 2),
                   n_channels=(64, 128, 256, 512), dtype=jnp.bfloat16)
images = jnp.zeros((B, 32, 32, 3), jnp.float32)
labels = jnp.arange(B, dtype=jnp.int32) % 10
variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
    jax.random.key(0), images[:1]
)
state = TrainState.create(
    {"params": variables["params"]}, make_optimizer(5e-4),
    jax.random.key(1), batch_stats=variables.get("batch_stats", {}),
)


def step(state, _):
    def loss_fn(params):
        logits, updates = model.apply(
            {"params": params["params"], "batch_stats": state.batch_stats},
            images, train=True, mutable=["batch_stats"],
        )
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()
        return loss, updates["batch_stats"]

    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    return state.apply_gradients(grads, batch_stats=new_stats), loss


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
print(f"classifier train step: {wall / ITERS * 1e3:.3f} ms "
      f"({ITERS / wall:.1f} steps/s) @ B={B}", flush=True)

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
    if "convolution" in n or ("fusion" in n and "conv" in n) or "dot" in n:
        return "conv/matmul fusions"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "layout copies"
    if "reduce" in n or "convert" in n:
        return "BatchNorm stats / reductions"
    if "multiply" in n or "add" in n or "subtract" in n or "divide" in n:
        return "optimizer/elementwise (Adam+EMA+BN scale)"
    if "scatter" in n or "select-and-scatter" in n:
        return "pool backward"
    if "slice" in n or "dynamic" in n or "gather" in n:
        return "slice/DMA"
    return "other"


groups = collections.Counter()
for name, us in agg.items():
    groups[group_of(name)] += us
print(f"non-while device time: {total / 1e3 / ITERS:.3f} ms/step busy",
      flush=True)
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
with open("/root/repo/perf/probe26.json", "w") as f:
    json.dump({"ms_per_step_wall": wall / ITERS * 1e3, "B": B,
               "ms_per_step_busy": total / 1e3 / ITERS,
               "groups": grows, "top_ops": rows}, f, indent=2)
print("done", flush=True)
