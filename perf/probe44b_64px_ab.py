"""Perf probe 44b: end-to-end effect of the 64px G-table entries (probe44).

Same-session A/B on the real chip, flagship UNet, T=400, 64x64, B=64 (the
standing `t400_64px` bench row's exact configuration, bench.py:655-657):

- sampler: one-scan ancestral DDPM + fused CFG, arm OLD = the pre-probe44
  G-table (the committed 12.2 img/s row's configuration — Pallas only at the
  three decoder sites whose (N, C) coincide with tabled 32px shapes, XLA at
  the five untabled site instances), arm NEW = the probe44-extended table
  (Pallas at every site).
- train step: attention_impl="auto_grads" under the same two tables
  (bench_train_step's scan-over-steps pattern, n=30) — tabling a shape also
  flips 64px *training* onto the hand-written Pallas bwd kernels.

The arms are fresh jit closures built after each table patch (G is read at
trace time).  Run order OLD->NEW per section; runs are multi-second so
order/jitter effects are second-order here (the 0.2 s-dispatch caveat in
CLAUDE.md does not bite at ~5 s/run).

Usage: python perf/probe44b_64px_ab.py   (real chip, TPU idle)
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

import ldm_tpu.ops.linear_attention as la
from ldm_tpu.diffusion.ddpm import GaussianDiffusion
from ldm_tpu.models.unet import UNet
from ldm_tpu.training.state import TrainState, make_optimizer

OLD_TABLE = {(1024, 64): 4, (256, 128): 16, (64, 256): 32,
             (16, 512): 32, (256, 64): 16}
NEW_TABLE = dict(OLD_TABLE)
NEW_TABLE.update({(4096, 64): 1, (1024, 128): 4, (256, 256): 16,
                  (64, 512): 32})

BATCH = 64
SHAPE = (64, 64, 3)


def build():
    model = UNet(in_channels=3, out_channels=3, channels=64,
                 channel_multipliers=(1, 2, 4, 8), num_classes=10,
                 dtype=jnp.bfloat16)
    diffusion = GaussianDiffusion(n_steps=400)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = jax.jit(model.init)(
        jax.random.key(0), x, jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32))
    return model, diffusion, params


def sampler_imgs_per_sec(model, diffusion, params):
    classes = np.arange(BATCH, dtype=np.int32) % 10  # host const (r5 rule)

    @jax.jit
    def run(params, key):
        return diffusion.sample(model.apply, params, key, classes, SHAPE,
                                cfg_scale=3.0, null_label=10)

    np.asarray(run(params, jax.random.key(0)))
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        np.asarray(run(params, jax.random.key(i + 1)))
        times.append(time.perf_counter() - t0)
    return BATCH / min(times)


def train_steps_per_sec(model, diffusion, params, n=30):
    train_model = model.clone(attention_impl="auto_grads")
    state = TrainState.create(params, make_optimizer(5e-4), jax.random.key(1))
    images = np.zeros((BATCH, *SHAPE), np.float32)
    labels = np.zeros((BATCH,), np.int32)

    def step(state, _):
        key = state.step_key()
        k_noise, k_drop = jax.random.split(key)
        eps, xt, t = diffusion.noise_batch(k_noise, images)
        y = jnp.where(jax.random.bernoulli(k_drop, 0.1), jnp.int32(10), labels)

        def loss_fn(p):
            return jnp.mean((eps - train_model.apply(p, xt, t, y)) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    @jax.jit
    def run(state):
        return jax.lax.scan(step, state, None, length=n)

    state, losses = run(state)
    np.asarray(losses)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = run(state)
        np.asarray(losses)
        times.append(time.perf_counter() - t0)
    return n / min(times)


def main():
    results = {"device": jax.devices()[0].device_kind,
               "batch": BATCH, "shape": list(SHAPE), "t": 400}
    model, diffusion, params = build()

    for name, table in (("old", OLD_TABLE), ("new", NEW_TABLE)):
        la._BLOCK_ITEMS_BY_KIND["TPU v5 lite"] = table
        imgs = sampler_imgs_per_sec(model, diffusion, params)
        results[f"sampler_imgs_per_sec_{name}"] = round(imgs, 3)
        print(f"sampler {name}: {imgs:.3f} img/s", flush=True)

    for name, table in (("old", OLD_TABLE), ("new", NEW_TABLE)):
        la._BLOCK_ITEMS_BY_KIND["TPU v5 lite"] = table
        steps = train_steps_per_sec(model, diffusion, params)
        results[f"train_steps_per_sec_{name}"] = round(steps, 3)
        print(f"train {name}: {steps:.3f} steps/s", flush=True)

    results["sampler_speedup"] = round(
        results["sampler_imgs_per_sec_new"]
        / results["sampler_imgs_per_sec_old"], 3)
    results["train_speedup"] = round(
        results["train_steps_per_sec_new"]
        / results["train_steps_per_sec_old"], 3)
    with open("/root/repo/perf/probe44b.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
