"""probe43: 128 px flagship gradient step on the REAL chip (VERDICT r4 item 6).

probe41 predicted from a CPU-arena extrapolation that a single-chip 128 px
flagship train step is "marginal to infeasible (~12 GB bf16 vs 16 GB HBM)" —
the prediction that pins where SP (spatial partitioning) stops being an
option and becomes mandatory.  This probe turns that into a device fact:

* sweep B upward (8 → 16 → 32 → 64) on the flagship UNet at 128x128x3,
  bf16 compute / fp32 params, the trainers' auto_grads attention config;
* per B: XLA's static memory_analysis() of the compiled step, the device's
  measured peak_bytes_in_use after one executed step, and fits-or-OOMs;
* at the first OOM batch, retry with jax.checkpoint (remat) around the UNet
  apply — the standard FLOPs-for-memory trade — and record whether remat
  rescues it.

Usage: python perf/probe43_128px_device.py
Output: perf/probe43_128px.json
"""

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

RES = 128
model = UNet(in_channels=3, out_channels=3, channels=64,
             channel_multipliers=(1, 2, 4, 8), num_classes=10,
             dtype=jnp.bfloat16, attention_impl="auto_grads")
diffusion = GaussianDiffusion(n_steps=1000)
params = jax.jit(model.init)(
    jax.random.key(0), jnp.zeros((1, RES, RES, 3), jnp.float32),
    jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
)
# The step donates its state (matching the real trainers, so XLA can alias
# input/output buffers and the peak reflects production).  Donation DELETES
# the input buffers after execution — including the typed PRNG key, which
# jax.device_get does NOT convert to host numpy — so each attempt rebuilds
# the whole TrainState from a host-numpy param snapshot.
_host_params = jax.device_get(params)


def fresh_state() -> TrainState:
    return TrainState.create(jax.device_put(_host_params),
                             make_optimizer(5e-4), jax.random.key(1))


def make_step(remat: bool):
    apply_fn = jax.checkpoint(model.apply) if remat else model.apply

    def step(state, images, labels):
        key = state.step_key()
        k_noise, k_drop = jax.random.split(key)
        eps, xt, t = diffusion.noise_batch(k_noise, images)
        y = jnp.where(jax.random.bernoulli(k_drop, 0.1, labels.shape),
                      jnp.int32(10), labels)

        def loss_fn(p):
            return jnp.mean((eps.astype(jnp.float32) - apply_fn(p, xt, t, y)) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    return step


def mem_stats():
    try:
        s = jax.devices()[0].memory_stats() or {}
        return {k: int(v) for k, v in s.items()
                if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")}
    except Exception:
        return {}


def attempt(batch: int, remat: bool) -> dict:
    row = {"batch": batch, "remat": remat}
    images = np.zeros((batch, RES, RES, 3), np.float32)  # host constants
    labels = np.zeros((batch,), np.int32)
    step = jax.jit(make_step(remat), donate_argnums=(0,))
    st = fresh_state()  # fresh buffers — the step donates them
    try:
        t0 = time.time()
        compiled = step.lower(st, images, labels).compile()
        row["compile_s"] = round(time.time() - t0, 1)
        ma = compiled.memory_analysis()
        if ma is not None:
            row["xla_temp_gib"] = round(ma.temp_size_in_bytes / 2**30, 3)
            row["xla_total_gib"] = round(
                (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                 + ma.output_size_in_bytes) / 2**30, 3)
    except Exception as e:
        row["fits"] = False
        row["error"] = f"compile: {type(e).__name__}: {e}"[:300]
        return row
    try:
        t0 = time.time()
        new_state, loss = compiled(st, images, labels)
        loss = float(np.asarray(loss))
        row["step_s_cold"] = round(time.time() - t0, 2)
        row["loss"] = round(loss, 4)
        row["fits"] = bool(np.isfinite(loss))
        row["device_mem"] = mem_stats()
        del new_state
    except Exception as e:
        row["fits"] = False
        row["error"] = f"execute: {type(e).__name__}: {e}"[:300]
    return row


out = {"device": str(jax.devices()[0]), "resolution": RES,
       "n_params": int(sum(p.size for p in jax.tree.leaves(params))),
       "attempts": []}

oom_batch = None
for b in (8, 16, 32, 64, 128):
    row = attempt(b, remat=False)
    out["attempts"].append(row)
    print(json.dumps(row), flush=True)
    if not row.get("fits"):
        oom_batch = b
        break

if oom_batch is not None:
    row = attempt(oom_batch, remat=True)
    out["attempts"].append(row)
    print(json.dumps(row), flush=True)

fit_batches = [a["batch"] for a in out["attempts"] if a.get("fits")]
out["max_fitting_batch_no_remat"] = max(
    [a["batch"] for a in out["attempts"] if a.get("fits") and not a["remat"]],
    default=0)
out["verdict"] = (
    "128px single-chip training FITS up to B="
    f"{out['max_fitting_batch_no_remat']} without remat"
    if fit_batches else "128px single-chip training does NOT fit at any batch"
)

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "probe43_128px.json"), "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out))
