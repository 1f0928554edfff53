"""Benchmark: CIFAR-10 sampled images/sec/chip for the full ancestral DDPM loop.

Headline metric (BASELINE.json): 1000-step DDPM sampling throughput on the
CIFAR-10-shaped class-conditional UNet with classifier-free guidance (the
reference's hot loop, src/DDPM.py:98-130).  Also measures UNet train steps/sec as a
secondary metric (reported in the JSON line's extra fields).

``vs_baseline`` compares against the REFERENCE DESIGN measured on the SAME chip: a
Python per-step loop with two separate UNet calls (cond + uncond) and a host sync
per step — exactly the reference algorithm's structure — timed once and cached in
BASELINE_MEASURED.json.  The reference repo itself publishes no throughput numbers
(BASELINE.md), so same-hardware design-vs-design is the honest comparison.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 128
T = 1000
BASELINE_FILE = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")


def build():
    from ldm_tpu.diffusion.ddpm import GaussianDiffusion
    from ldm_tpu.models.unet import UNet

    model = UNet(in_channels=3, out_channels=3, channels=64,
                 channel_multipliers=(1, 2, 4, 8), num_classes=10,
                 dtype=jnp.bfloat16)
    diffusion = GaussianDiffusion(n_steps=T)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = jax.jit(model.init)(
        jax.random.key(0), x, jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32)
    )
    return model, diffusion, params


def bench_scan_sampler(model, diffusion, params) -> float:
    """Our design: whole T-step loop as one on-device lax.scan, batched CFG."""
    classes = jnp.arange(BATCH, dtype=jnp.int32) % 10

    @jax.jit
    def run(params, key):
        return diffusion.sample(
            model.apply, params, key, classes, (32, 32, 3),
            cfg_scale=3.0, null_label=10,
        )

    run(params, jax.random.key(0)).block_until_ready()  # compile
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        run(params, jax.random.key(i + 1)).block_until_ready()
        times.append(time.perf_counter() - t0)
    return BATCH / min(times)


def bench_reference_style(model, diffusion, params, n_steps: int = 50) -> float:
    """The reference algorithm's structure on the same chip: Python loop, two
    separate jitted UNet calls per step (cond, uncond), lerp and p_sample on
    device but loop + step indexing driven from host (src/DDPM.py:98-130).
    Timed over n_steps and extrapolated to T (per-step cost is constant)."""
    classes = jnp.arange(BATCH, dtype=jnp.int32) % 10
    null = jnp.full((BATCH,), 10, jnp.int32)
    fwd = jax.jit(model.apply)
    p_sample = jax.jit(diffusion.p_sample)

    def step(xt, t_int, key):
        t_vec = jnp.full((BATCH,), t_int, jnp.int32)
        eps_c = fwd(params, xt, t_vec, classes)
        eps_u = fwd(params, xt, t_vec, null)
        eps = eps_u + 3.0 * (eps_c - eps_u)
        noise = jax.random.normal(jax.random.fold_in(key, t_int), xt.shape, xt.dtype)
        return p_sample(xt, t_vec, eps, noise)

    key = jax.random.key(0)
    xt = jax.random.normal(key, (BATCH, 32, 32, 3), jnp.float32)
    xt = step(xt, T - 1, key)  # compile
    xt.block_until_ready()
    t0 = time.perf_counter()
    for t_int in range(T - 2, T - 2 - n_steps, -1):
        xt = step(xt, t_int, key)
        float(xt[0, 0, 0, 0])  # the reference's per-step host sync (t[0].item())
    dt = time.perf_counter() - t0
    return BATCH / (dt / n_steps * T)


def bench_train_step(model, diffusion, params) -> float:
    """UNet train steps/sec (secondary metric)."""
    import optax

    from ldm_tpu.training.state import TrainState, make_optimizer

    state = TrainState.create(params, make_optimizer(5e-4), jax.random.key(1))
    batch = {
        "image": jnp.zeros((64, 32, 32, 3), jnp.float32),
        "label": jnp.zeros((64,), jnp.int32),
    }

    @jax.jit
    def train_step(state, batch):
        key = state.step_key()
        k_noise, k_drop = jax.random.split(key)
        eps, xt, t = diffusion.noise_batch(k_noise, batch["image"])
        y = jnp.where(jax.random.bernoulli(k_drop, 0.1),
                      jnp.int32(10), batch["label"])

        def loss_fn(p):
            return jnp.mean((eps - model.apply(p, xt, t, y)) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    state, loss = train_step(state, batch)
    loss.block_until_ready()
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        state, loss = train_step(state, batch)
    loss.block_until_ready()
    return n / (time.perf_counter() - t0)


def main():
    n_chips = jax.device_count()
    model, diffusion, params = build()

    imgs_per_sec = bench_scan_sampler(model, diffusion, params) / n_chips
    steps_per_sec = bench_train_step(model, diffusion, params)

    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f)["reference_style_images_per_sec_per_chip"]
    else:
        baseline = bench_reference_style(model, diffusion, params) / n_chips
        with open(BASELINE_FILE, "w") as f:
            json.dump(
                {
                    "reference_style_images_per_sec_per_chip": baseline,
                    "note": "reference algorithm structure (Python loop, 2 UNet "
                            "calls/step, host sync/step) on the same chip, T=1000, "
                            f"batch {BATCH}",
                    "device": str(jax.devices()[0]),
                },
                f, indent=2,
            )

    print(json.dumps({
        "metric": "CIFAR-10 sampled images/sec/chip (1000-step DDPM, CFG)",
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / baseline, 2),
        "train_steps_per_sec": round(steps_per_sec, 3),
        "batch": BATCH,
        "n_chips": n_chips,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
