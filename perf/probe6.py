"""Perf probe 6: dispatch-corrected A/B of the linear-attention block.

probe4/probe5 used a 30-iteration scan: the jit dispatch latency over the
axon tunnel (~15-25 ms) amortizes to ~0.5-0.9 ms/iter — the same order as the
op itself (the flat ~0.92 ms floor across the two small shapes in probe4.json
is that overhead, not compute).  Here: ITERS=300, plus an explicit empty-scan
measurement so the JSON records the overhead separately.

Usage: python perf/probe6.py   (real chip)
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

from ldm_tpu.ops.linear_attention import (
    linear_attention_block_pallas,
    linear_attention_block_xla,
)

HEADS, DIM_HEAD, HIDDEN = 4, 32, 128
ITERS = 300


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


def scan_ms(fn, b, n, c):
    x, w = make_inputs(b, n, c)

    def run(x):
        def step(x, _):
            return fn(x, w), None
        y, _ = jax.lax.scan(step, x, None, length=ITERS)
        return y.astype(jnp.float32).mean()

    return timed(run, x) / ITERS * 1e3


def xla_fn(x, w):
    return linear_attention_block_xla(
        x, *w, heads=HEADS, dim_head=DIM_HEAD, compute_dtype=jnp.bfloat16)


def pallas_fn(g):
    def fn(x, w):
        return linear_attention_block_pallas(
            x, *w, heads=HEADS, dim_head=DIM_HEAD, compute_dtype=jnp.bfloat16,
            block_items=g)
    return fn


def main():
    results = {}

    # dispatch overhead: same scan, identity body
    x, _ = make_inputs(128, 256, 128)

    def empty(x):
        y, _ = jax.lax.scan(lambda x, _: (x * 1.0001, None), x, None, length=ITERS)
        return y.astype(jnp.float32).mean()

    results["overhead_ms_per_iter"] = round(timed(empty, x) / ITERS * 1e3, 5)
    print(f"overhead/iter: {results['overhead_ms_per_iter']} ms", flush=True)

    LEVELS = [(1024, 64, (2, 4)), (256, 128, (8, 16)),
              (64, 256, (16, 32)), (16, 512, (32, 64))]
    for b in (128, 512):
        for n, c, gs in LEVELS:
            row = {"xla_ms": round(scan_ms(xla_fn, b, n, c), 4)}
            for g in gs:
                if b % g:
                    continue
                try:
                    row[f"g{g}"] = round(scan_ms(pallas_fn(g), b, n, c), 4)
                except Exception as e:
                    row[f"g{g}"] = f"fail: {type(e).__name__}"
            best = min((v for k, v in row.items()
                        if k.startswith("g") and isinstance(v, float)), default=None)
            row["best_speedup"] = round(row["xla_ms"] / best, 2) if best else None
            results[f"b{b}_n{n}_c{c}"] = row
            print(f"b={b} N={n} C={c}: {row}", flush=True)
            with open("/root/repo/perf/probe6.json", "w") as f:
                json.dump(results, f, indent=2)
    print("done", flush=True)


if __name__ == "__main__":
    main()
