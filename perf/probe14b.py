"""Perf probe 14b: packed-kernel G sweep at 2B=128 (bench's best batch — the
probe14 table was tuned at 2B=256), both C=64 shapes."""

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
B = 128
DT = jnp.bfloat16


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
for n, c in [(1024, 64), (256, 64)]:
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
    key = f"N{n}_C{c}_2B{B}"
    row = {}
    t_xla = scan_ms(lambda t: la.linear_attention_block_xla(t, *args, **kw), x)
    row["xla_ms"] = round(t_xla, 4)
    print(f"{key}: xla {t_xla:.4f}", flush=True)
    for g in (2, 4, 8, 16):
        if B % g:
            continue
        try:
            t_p = scan_ms(lambda t, g=g: la.linear_attention_block_pallas(
                t, *args, block_items=g, **kw), x)
            row[f"packed_g{g}_ms"] = round(t_p, 4)
            print(f"{key} g={g}: {t_p:.4f} ({t_xla / t_p:.2f}x)", flush=True)
        except Exception as e:  # noqa: BLE001
            row[f"packed_g{g}_ms"] = f"FAIL {type(e).__name__}"
            print(f"{key} g={g}: FAIL {str(e)[:120]}", flush=True)
    results[key] = row

with open("/root/repo/perf/probe14b.json", "w") as f:
    json.dump(results, f, indent=2)
print("done", flush=True)
