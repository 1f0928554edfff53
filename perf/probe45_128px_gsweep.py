"""Perf probe 45: G-table candidates for the 128px (SP-relevant) resolution.

Completes the resolution ladder after probe44 (64px).  At 128x128 the
UNet's attention sites are (16384,64) x2, (4096,128), (1024,256), (256,512)
plus the 64px set as decoder sites (tabled by probe44).  The probe44 wall —
one G step above the winners VMEM-fails at every shape — predicts the
(16384,64) site cannot run the fused kernel at all (packed rows 8192 at
G=1, double the (4096,64)-G=1 winner that sits at the wall), so the probe's
question is whether the three deeper sites win and by how much.

128px training at B<=128 fits on one v5e (perf/probe43_128px.json), so the
fwd+bwd numbers here price the resolution where SP becomes relevant;
sampling at 128px has no bench row, so block-level + a train-step A/B is
the end-to-end anchor (B=16: small enough to keep the sweep fast, large
enough that per-dispatch latency is <2% of a step).

Usage: python perf/probe45_128px_gsweep.py   (real chip, TPU idle)
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

HEADS, DIM_HEAD, HIDDEN = 4, 32, 128
ITERS = 100
B = 32  # 2B for a B=16 fused-CFG sampler / the B=32 train step

# (n, c, candidate Gs): probe44's wall was byte-dependent per shape; start
# at the analog of each 64px winner and probe one step either side.
LEVELS = [
    (16384, 64, (1,)),          # expected fail: packed 8192 rows at G=1
    (4096, 128, (1, 2)),
    (1024, 256, (2, 4, 8)),
    (256, 512, (4, 8, 16)),
]


def make_inputs(b, n, c):
    ks = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(ks[0], (b, n, c), jnp.bfloat16)
    w = (
        jax.random.normal(ks[1], (c, 3 * HIDDEN), jnp.float32) * 0.2,
        jax.random.normal(ks[2], (HIDDEN, c), jnp.float32) * 0.2,
        jnp.zeros((c,), jnp.float32),
        jnp.ones((c,)), jnp.zeros((c,)), jnp.ones((c,)), jnp.zeros((c,)),
    )
    return x, w


def timed(fn, x):
    run = jax.jit(fn)
    np.asarray(run(x))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(x))
        times.append(time.perf_counter() - t0)
    return min(times)


def scan_ms(fn, x, w, iters):
    def run(x):
        def step(x, _):
            return fn(x, w), None
        y, _ = jax.lax.scan(step, x, None, length=iters)
        return y.astype(jnp.float32).mean()

    return timed(run, x) / iters * 1e3


def xla_fn(x, w):
    return la.linear_attention_block_xla(
        x, *w, heads=HEADS, dim_head=DIM_HEAD, compute_dtype=jnp.bfloat16)


def pallas_fn(g):
    def fn(x, w):
        return la.linear_attention_block_pallas(
            x, *w, heads=HEADS, dim_head=DIM_HEAD, compute_dtype=jnp.bfloat16,
            block_items=g)
    return fn


def grads_fn(x, w):
    return la.linear_attention_block_fused_grads(
        x, *w, HEADS, DIM_HEAD, 1e-5, jnp.bfloat16)


def grad_scan_ms(fn, x, w, iters):
    def loss(x, w):
        return fn(x, w).astype(jnp.float32).mean()

    def run(x):
        def step(carry, _):
            x, w = carry
            dx, dw = jax.grad(loss, argnums=(0, 1))(x, w)
            return (x + 1e-6 * dx.astype(x.dtype),
                    tuple(a + 1e-6 * b for a, b in zip(w, dw))), None
        (y, _), _ = jax.lax.scan(step, (x, w), None, length=iters)
        return y.astype(jnp.float32).mean()

    return timed(run, x) / iters * 1e3


def main():
    results = {"device": jax.devices()[0].device_kind, "batch": B}

    winners = {}
    for n, c, gs in LEVELS:
        x, w = make_inputs(B, n, c)
        row = {"xla_ms": round(scan_ms(xla_fn, x, w, ITERS), 4)}
        best_g, best_ms = None, row["xla_ms"]
        for g in gs:
            if B % g:
                continue
            try:
                ms = scan_ms(pallas_fn(g), x, w, ITERS)
            except Exception as e:
                row[f"g{g}"] = f"fail {type(e).__name__}"
                continue
            row[f"g{g}"] = round(ms, 4)
            if ms < best_ms:
                best_g, best_ms = g, ms
        if best_g is not None:
            row["winner"] = best_g
            row["speedup_vs_xla"] = round(row["xla_ms"] / best_ms, 3)
            winners[(n, c)] = best_g
        results[f"fwd_b{B}_n{n}_c{c}"] = row
        print(f"fwd ({n},{c}): {row}", flush=True)

    # bwd validation at the winners (table patched in-process)
    table = la._BLOCK_ITEMS_BY_KIND["TPU v5 lite"]
    patched = dict(table)
    patched.update(winners)
    la._BLOCK_ITEMS_BY_KIND["TPU v5 lite"] = patched
    try:
        for (n, c), g in winners.items():
            x, w = make_inputs(B, n, c)
            row = {"fwd_g": g, "bwd_g": la._pick_block_items_bwd(B, n, c)}
            try:
                row["xla_ms"] = round(grad_scan_ms(xla_fn, x, w, 30), 4)
                row["pallas_ms"] = round(grad_scan_ms(grads_fn, x, w, 30), 4)
                row["speedup_vs_xla"] = round(
                    row["xla_ms"] / row["pallas_ms"], 3)
            except Exception as e:
                row["error"] = f"{type(e).__name__}: {e}"[:200]
            results[f"grads_b{B}_n{n}_c{c}"] = row
            print(f"grads ({n},{c}): {row}", flush=True)
    finally:
        la._BLOCK_ITEMS_BY_KIND["TPU v5 lite"] = table

    results["winners"] = {f"{n}x{c}": g for (n, c), g in winners.items()}
    with open("/root/repo/perf/probe45.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
