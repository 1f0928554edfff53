"""Perf probe 44: tune the Pallas G-table for the 64x64 resolution axis.

The v5e G-table (ldm_tpu/ops/linear_attention.py `_BLOCK_ITEMS_BY_KIND`)
covers only the 32px flagship shapes, so at 64x64 five of the eight per-level
attention-site instances — (4096,64) twice, (1024,128), (256,256), (64,512) —
fall back to the XLA path (prefer_pallas returns False on untabled shapes by
design).  The standing `t400_64px` bench row (runs/bench_r05.json: 12.2
img/s) therefore runs the hot sites on XLA.  This probe, on the real chip:

1. fwd: per-shape A/B of the fused kernel at candidate Gs vs the XLA path at
   the sampler's fused-CFG batch (2B=128), probe6's scan-in-one-dispatch
   discipline (ITERS=300, dispatch overhead measured separately).
2. fwd+bwd: with the winning Gs patched into the table in-process, grad of
   `linear_attention_block_fused_grads` (Pallas fwd + hand-written Pallas bwd,
   bwd G = half-of-fwd heuristic) vs grad of the XLA path — tabling a fwd
   shape activates auto_grads' Pallas path for 64px *training*, so the bwd
   must be validated non-pathological before the table lands (the (64,256)
   G=8 spill in perf/probe20.json is the failure mode this guards).

Candidate Gs follow the measured VMEM budget: the fused buffers scale with
G*N*C, and gn=G*N > 8192 rows failed with JaxRuntimeError at C=64 in probe7b
— candidates stop there.

Usage: python perf/probe44_64px_gsweep.py   (real chip, TPU idle)
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
ITERS = 300
ITERS_BWD = 100
B = 128  # the sampler's fused-CFG batch at B=64

# (n, c, candidate Gs): G*N capped at 8192 rows (probe7b's VMEM wall at C=64;
# C>=128 shapes keep the same row cap since intermediates are (gn, 128)).
LEVELS = [
    (4096, 64, (1, 2)),
    (1024, 128, (2, 4, 8)),
    (256, 256, (8, 16, 32)),
    (64, 512, (16, 32, 64)),
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


def grad_scan_ms(fn, x, w, iters):
    """fwd+bwd per iter: d/dx+d/dw of mean(block(x, w)), params carried."""

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


def main():
    results = {"device": jax.devices()[0].device_kind, "batch": B}

    x, w = make_inputs(B, 256, 128)

    def empty(x):
        y, _ = jax.lax.scan(lambda x, _: (x * 1.0001, None), x, None,
                            length=ITERS)
        return y.astype(jnp.float32).mean()

    results["overhead_ms_per_iter"] = round(timed(empty, x) / ITERS * 1e3, 5)
    print(f"overhead/iter: {results['overhead_ms_per_iter']} ms", flush=True)

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
            except Exception as e:  # VMEM overflow etc: record, move on
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

    # ---- bwd validation at the winning Gs (table patched in-process) ----
    table = la._BLOCK_ITEMS_BY_KIND["TPU v5 lite"]
    patched = dict(table)
    patched.update(winners)
    la._BLOCK_ITEMS_BY_KIND["TPU v5 lite"] = patched
    try:
        for (n, c), g in winners.items():
            x, w = make_inputs(B, n, c)
            row = {"fwd_g": g, "bwd_g": la._pick_block_items_bwd(B, n, c)}
            try:
                row["xla_ms"] = round(grad_scan_ms(xla_fn, x, w, ITERS_BWD), 4)
                row["pallas_ms"] = round(
                    grad_scan_ms(grads_fn, x, w, ITERS_BWD), 4)
                row["speedup_vs_xla"] = round(
                    row["xla_ms"] / row["pallas_ms"], 3)
            except Exception as e:
                row["error"] = f"{type(e).__name__}: {e}"[:200]
            results[f"grads_b{B}_n{n}_c{c}"] = row
            print(f"grads ({n},{c}): {row}", flush=True)
    finally:
        la._BLOCK_ITEMS_BY_KIND["TPU v5 lite"] = table

    results["winners"] = {f"{n}x{c}": g for (n, c), g in winners.items()}
    with open("/root/repo/perf/probe44.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
