"""Perf probe 4: validate + time the restructured linear-attention block.

Fixed methodology vs probe3: the timed jit returns ONE scalar (the tunnel
transfers ~1 GB/s, so returning (B,N,C) tensors measured the fetch, not the op).
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

from ldm_tpu.ops.linear_attention import linear_attention_block_xla

HEADS, DIM_HEAD, HIDDEN = 4, 32, 128
ITERS = 30


def old_block(x, wqkv, wout, bout, g1s, g1b, g2s, g2b, *, eps=1e-5, cd=jnp.float32):
    """Round-1 formulation (4D-reshape q softmax), for A/B comparison."""
    b, n, c = x.shape
    xf32 = x.astype(jnp.float32)
    mean = xf32.mean(axis=(1, 2), keepdims=True)
    var = xf32.var(axis=(1, 2), keepdims=True)
    h = ((xf32 - mean) * jax.lax.rsqrt(var + eps) * g1s + g1b).astype(cd)
    qkv = h @ wqkv.astype(cd)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = jax.nn.softmax(q.reshape(b, n, HEADS, DIM_HEAD).astype(jnp.float32), axis=-1)
    q = (q * (DIM_HEAD**-0.5)).reshape(b, n, HIDDEN).astype(cd)
    k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(cd)
    mask = jnp.kron(jnp.eye(HEADS, dtype=cd), jnp.ones((DIM_HEAD, DIM_HEAD), cd))
    ctx = jnp.einsum("bnd,bne->bde", k, v) * mask
    ctx_w = jnp.einsum("bde,ec->bdc", ctx, wout.astype(cd))
    out = jnp.einsum("bdc,bnd->bnc", ctx_w, q) + bout.astype(cd)
    of32 = out.astype(jnp.float32)
    mean2 = of32.mean(axis=(1, 2), keepdims=True)
    var2 = of32.var(axis=(1, 2), keepdims=True)
    o = (of32 - mean2) * jax.lax.rsqrt(var2 + eps) * g2s + g2b
    return (x.astype(jnp.float32) + o).astype(x.dtype)


def make_inputs(b, n, c, dtype):
    ks = jax.random.split(jax.random.key(0), 9)
    x = jax.random.normal(ks[0], (b, n, c), dtype)
    w = (
        jax.random.normal(ks[1], (c, 3 * HIDDEN), jnp.float32) * 0.2,
        jax.random.normal(ks[2], (HIDDEN, c), jnp.float32) * 0.2,
        jnp.zeros((c,), jnp.float32),
        jnp.ones((c,)), jnp.zeros((c,)), jnp.ones((c,)), jnp.zeros((c,)),
    )
    return x, w


# ---------------- numeric agreement (old vs new), f32 and bf16.
# NOTE: f32 tolerance is loose because TPU matmuls default to bf16 MXU passes
# even for f32 inputs; on CPU (the torch-parity test platform) the two
# formulations agree to 2e-7.
for dtype, cd, tol in ((jnp.float32, jnp.float32, 2e-2), (jnp.bfloat16, jnp.bfloat16, 5e-2)):
    x, w = make_inputs(8, 64, 64, dtype)
    y_old = np.asarray(jax.jit(lambda x: old_block(x, *w, cd=cd))(x), np.float32)
    y_new = np.asarray(jax.jit(lambda x: linear_attention_block_xla(
        x, *w, heads=HEADS, dim_head=DIM_HEAD, compute_dtype=cd))(x), np.float32)
    err = np.abs(y_old - y_new).max() / max(np.abs(y_old).max(), 1e-6)
    print(f"agreement {cd.__name__}: max rel err {err:.2e} (tol {tol})", flush=True)
    assert err < tol, (cd, err)

# ---------------- timing: scalar output, dependent chain like the sampler
def bench(fn, b, n, c):
    x, w = make_inputs(b, n, c, jnp.bfloat16)

    @jax.jit
    def run(x):
        def step(x, _):
            y = fn(x, w)
            return y, None
        y, _ = jax.lax.scan(step, x, None, length=ITERS)
        return y.astype(jnp.float32).mean()  # scalar: no tunnel fetch

    np.asarray(run(x))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(x))
        times.append(time.perf_counter() - t0)
    return min(times) / ITERS * 1e3


LEVELS = [(1024, 64), (256, 128), (64, 256), (16, 512)]
results = {}
for b in (128, 512):
    for n, c in LEVELS:
        t_old = bench(lambda x, w: old_block(x, *w, cd=jnp.bfloat16), b, n, c)
        t_new = bench(lambda x, w: linear_attention_block_xla(
            x, *w, heads=HEADS, dim_head=DIM_HEAD, compute_dtype=jnp.bfloat16),
            b, n, c)
        results[f"b{b}_n{n}_c{c}"] = {"old_ms": round(t_old, 4),
                                      "new_ms": round(t_new, 4),
                                      "speedup": round(t_old / t_new, 2)}
        print(f"b={b} N={n} C={c}: old {t_old:.3f} ms  new {t_new:.3f} ms  "
              f"({t_old/t_new:.2f}x)", flush=True)

with open("/root/repo/perf/probe4.json", "w") as f:
    json.dump(results, f, indent=2)
