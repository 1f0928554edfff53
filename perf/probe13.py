"""Perf probe 13: the fused ResNet-block Pallas kernel vs the XLA path,
isolated per UNet site shape (2B=256, bf16), plus a G sweep and an on-chip
correctness check.  Dispatch-corrected: 300-iteration scans, scalar return.
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

from ldm_tpu.ops.resnet_block import resnet_block_pallas, resnet_block_xla

ITERS = 300
B = 256
DT = jnp.bfloat16

# (name, side, cin, cout)
SITES = [
    ("encL0_32x32_64to64", 32, 64, 64),
    ("decL0_32x32_128to64", 32, 128, 64),
    ("encL1_16x16_64to128", 16, 64, 128),
    ("decL1_16x16_192to64", 16, 192, 64),
]


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
for name, side, cin, cout in SITES:
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, side, side, cin) * 0.5, DT)
    temb = jnp.asarray(rng.randn(B, cout) * 0.1, jnp.float32)
    pr = {}
    pr["n1s"] = jnp.asarray(1 + 0.1 * rng.randn(cin), jnp.float32)
    pr["n1b"] = jnp.asarray(0.1 * rng.randn(cin), jnp.float32)
    pr["w1"] = jnp.asarray(rng.randn(3, 3, cin, cout) / np.sqrt(9 * cin), jnp.float32)
    pr["b1"] = jnp.asarray(0.1 * rng.randn(cout), jnp.float32)
    pr["n2s"] = jnp.asarray(1 + 0.1 * rng.randn(cout), jnp.float32)
    pr["n2b"] = jnp.asarray(0.1 * rng.randn(cout), jnp.float32)
    pr["w2"] = jnp.asarray(rng.randn(3, 3, cout, cout) / np.sqrt(9 * cout), jnp.float32)
    pr["b2"] = jnp.asarray(0.1 * rng.randn(cout), jnp.float32)
    use_sc = cin != cout
    pr["ws"] = (jnp.asarray(rng.randn(cin, cout) / np.sqrt(cin), jnp.float32)
                if use_sc else jnp.zeros((1, 1), DT))
    pr["bs"] = (jnp.asarray(0.1 * rng.randn(cout), jnp.float32)
                if use_sc else jnp.zeros((1, 1), DT))
    args = (x, temb, pr["n1s"], pr["n1b"], pr["w1"], pr["b1"],
            pr["n2s"], pr["n2b"], pr["w2"], pr["b2"], pr["ws"], pr["bs"])
    kw = dict(groups=8, compute_dtype=DT, use_shortcut=use_sc)

    # correctness on chip
    want = np.asarray(jax.jit(
        lambda *a: resnet_block_xla(*a, **kw))(*args), np.float32)
    got = np.asarray(jax.jit(
        lambda *a: resnet_block_pallas(*a, **kw))(*args), np.float32)
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)

    t_xla = scan_ms(lambda t: resnet_block_xla(
        t, temb, *args[2:], **kw), x)
    row = {"xla_ms": round(t_xla, 4), "rel_err": float(f"{err:.2e}")}
    n = side * side
    from ldm_tpu.ops import resnet_block as rb
    g_default = rb._BLOCK_ITEMS.get((n, cin, cout))
    for g in sorted({1, 2, 4, 8, g_default or 4}):
        if B % g:
            continue
        try:
            t_p = scan_ms(lambda t, g=g: resnet_block_pallas(
                t, temb, *args[2:], block_items=g, **kw), x)
            row[f"pallas_g{g}_ms"] = round(t_p, 4)
            print(f"{name} g={g}: pallas {t_p:.4f} ms vs xla {t_xla:.4f} "
                  f"({t_xla / t_p:.2f}x)", flush=True)
        except Exception as e:  # noqa: BLE001 — report Mosaic failures per G
            row[f"pallas_g{g}_ms"] = f"FAIL {type(e).__name__}"
            print(f"{name} g={g}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    print(f"{name}: err {err:.1e}", flush=True)
    results[name] = row

with open("/root/repo/perf/probe13.json", "w") as f:
    json.dump(results, f, indent=2)
print("done", flush=True)
