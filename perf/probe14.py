"""Perf probe 14: pixel-pair-packed attention kernel (C=64 sites) vs the
round-2 unpacked kernel vs the XLA path.  2B=256, bf16, 300-iter scans.

probe13b exposed the 2x (., 64) tile-padding tax; the packed kernel's I/O is
128-lane clean.  G sweep to re-find the VMEM/overhead optimum.
"""

import functools
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

ITERS = 300
B = 256
DT = jnp.bfloat16
SHAPES = [(1024, 64), (256, 64)]


def scan_ms(fn, x):
    @jax.jit
    def run(x):
        def step(acc, i):
            y = fn(x * (1.0 + i.astype(x.dtype) * 1e-6))
            return acc + y.astype(jnp.float32).mean(), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(ITERS, dtype=jnp.int32))
        return acc

    np.asarray(run(x))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(x))
        times.append(time.perf_counter() - t0)
    return min(times) / ITERS * 1e3


results = {}
for n, c in SHAPES:
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, n, c) * 0.5, DT)
    wqkv = jnp.asarray(rng.randn(c, 384) / 8, jnp.float32)
    wout = jnp.asarray(rng.randn(128, c) / 11, jnp.float32)
    bout = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    g1s = jnp.asarray(1 + 0.1 * rng.randn(c), jnp.float32)
    g1b = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
    g2s = jnp.asarray(1 + 0.1 * rng.randn(c), jnp.float32)
    g2b = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
    kw = dict(heads=4, dim_head=32, compute_dtype=DT)
    args = (wqkv, wout, bout, g1s, g1b, g2s, g2b)

    want = np.asarray(jax.jit(functools.partial(
        la.linear_attention_block_xla, **kw))(x, *args), np.float32)
    got = np.asarray(jax.jit(functools.partial(
        la.linear_attention_block_pallas, **kw))(x, *args), np.float32)
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)

    t_xla = scan_ms(lambda t: la.linear_attention_block_xla(t, *args, **kw), x)
    key = f"N{n}_C{c}"
    row = {"xla_ms": round(t_xla, 4), "rel_err": float(f"{err:.2e}")}
    print(f"{key}: xla {t_xla:.4f} ms, packed rel_err {err:.1e}", flush=True)

    # unpacked (round-2) kernel reference points: probe7b/7c.json and the
    # in-situ trace (0.56 ms/block at this shape, perf/probe11.json)

    for g in (2, 4, 8, 16, 32):
        if B % g:
            continue
        try:
            t_p = scan_ms(lambda t, g=g: la.linear_attention_block_pallas(
                t, *args, block_items=g, **kw), x)
            row[f"packed_g{g}_ms"] = round(t_p, 4)
            print(f"{key} g={g}: packed {t_p:.4f} ms ({t_xla / t_p:.2f}x vs xla)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            row[f"packed_g{g}_ms"] = f"FAIL {type(e).__name__}"
            print(f"{key} g={g}: FAIL {str(e)[:160]}", flush=True)
    results[key] = row

with open("/root/repo/perf/probe14.json", "w") as f:
    json.dump(results, f, indent=2)
print("done", flush=True)
