"""probe38: VAE train-step breakdown + batch roofline (VERDICT r3 item 6).

bench.py measures the flagship VAE (autoencoder_cifar10 arch, 32x32x3,
z=8) elbo_mse train step at MFU ~0.23 / ~57 steps/s at B=64 — the only
fleet member with zero perf investigation.  This is its probe19-style
breakdown: forward / forward+backward / optimizer buckets, each timed as a
scan on the chip, plus the batch sweep that tells us whether B=64 MFU is a
utilization artifact (like the UNet's measured B=64 floor,
docs/perf_round3.md) or an actual inefficiency.

Buckets (all B-batch, bf16 compute / fp32 params):
  fwd        loss only (no grad)
  fwd+bwd    value_and_grad, gradients discarded into a dummy sum
  optimizer  Adam+EMA stream alone (no model math)  [~36 B/param HBM-bound]
  full       the real train step (fwd+bwd+optimizer)

Usage: python perf/probe38_vae_trace.py
Output: perf/probe38.json
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

from ldm_tpu.models.autoencoder import Autoencoder  # noqa: E402
from ldm_tpu.training.autoencoder_trainer import elbo_mse  # noqa: E402
from ldm_tpu.training.state import TrainState, make_optimizer  # noqa: E402

V5E_BF16_PEAK = 394e12

model = Autoencoder(in_channels=3, out_channels=3, channels=64,
                    channel_multipliers=(1, 2, 4, 8), n_resnet_blocks=2,
                    z_channels=8, dtype=jnp.bfloat16)
params = jax.jit(model.init)(jax.random.key(0),
                             jnp.zeros((1, 32, 32, 3), jnp.float32),
                             jax.random.key(1))
state = TrainState.create(params, make_optimizer(5e-4), jax.random.key(2))
n_params = sum(p.size for p in jax.tree.leaves(params))


def time_scan(body, init, n=50, reps=3):
    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=n))
    c = run(init)
    np.asarray(jax.tree.leaves(c)[0])  # tunnel-safe barrier
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c2 = run(init)
        np.asarray(jax.tree.leaves(c2)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) / n


def flops_of(fn, *args):
    try:
        a = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(a, list):
            a = a[0]
        return float(a.get("flops", 0.0))
    except Exception:
        return 0.0


out = {"device": str(jax.devices()[0]), "n_params": int(n_params)}

for batch in (64, 256):
    # images must be loop-VARIANT inside the timing scans (derived from the
    # per-iteration key) or XLA hoists the encoder out of the loop — the
    # RNG-normal generation cost is negligible vs the model
    def loss_fn(p, key):
        kx, kz = jax.random.split(key)
        images = jax.random.normal(kx, (batch, 32, 32, 3), jnp.float32)
        recon, mu, log_var = model.apply(p, images, kz)
        return elbo_mse(recon, images, mu, log_var)

    # fwd: carry the loss so the scan can't DCE the model.  CRITICAL: fold a
    # carried counter into the reparam key — with a loop-invariant key (the
    # round-4 first run) the whole model is hoistable out of the scan and
    # fwd_ms measures ~nothing (perf/probe38.json "caveat").
    def fwd_body(carry, _):
        s, acc, i = carry
        key = jax.random.fold_in(s.step_key(), i)
        return (s, acc + loss_fn(s.params, key), i + 1), None

    # fwd+bwd: fold the grads into a scalar so they're consumed but the
    # optimizer stream never runs
    def fwdbwd_body(carry, _):
        s, acc, i = carry
        key = jax.random.fold_in(s.step_key(), i)
        loss, grads = jax.value_and_grad(loss_fn)(s.params, key)
        gsum = sum(jnp.sum(g) for g in jax.tree.leaves(grads))
        return (s, acc + loss + gsum.astype(jnp.float32), i + 1), None

    def full_body(s, _):
        loss, grads = jax.value_and_grad(loss_fn)(s.params, s.step_key())
        return s.apply_gradients(grads), loss

    z = jnp.zeros((), jnp.float32)
    i0 = jnp.zeros((), jnp.int32)
    ms_fwd = time_scan(fwd_body, (state, z, i0)) * 1e3
    ms_fwdbwd = time_scan(fwdbwd_body, (state, z, i0)) * 1e3
    ms_full = time_scan(full_body, state) * 1e3

    step_flops = flops_of(lambda s: full_body(s, None)[0], state)
    mfu = (step_flops / (ms_full / 1e3)) / V5E_BF16_PEAK if step_flops else None
    row = {
        "fwd_ms": round(ms_fwd, 3),
        "fwd_bwd_ms": round(ms_fwdbwd, 3),
        "full_step_ms": round(ms_full, 3),
        "optimizer_residual_ms": round(ms_full - ms_fwdbwd, 3),
        "bwd_over_fwd": round((ms_fwdbwd - ms_fwd) / ms_fwd, 2),
        "steps_per_sec": round(1e3 / ms_full, 1),
        "imgs_per_sec": round(batch * 1e3 / ms_full, 1),
        "step_flops": step_flops,
        "mfu": round(mfu, 4) if mfu else None,
    }
    out[f"b{batch}"] = row
    print(f"b{batch}", row, flush=True)

# optimizer stream alone (B-free): the HBM-bound Adam+EMA pass
gfix = jax.tree.map(lambda p: jnp.full(p.shape, 1e-4, jnp.float32), params)
ms_opt = time_scan(lambda s, _: (s.apply_gradients(gfix), None), state) * 1e3
out["optimizer_only_ms"] = round(ms_opt, 4)
out["optimizer_pure_hbm_bound_ms_819GBps"] = round(
    36.0 * n_params / 819e9 * 1e3, 4)
print("optimizer_only_ms", out["optimizer_only_ms"], flush=True)

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "probe38.json"), "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out))
