"""probe20: items-per-program (G) sweep for the BACKWARD attention kernels.

The bwd wrapper defaults to half the forward's measured G (VMEM headroom
guess).  Sweep real G values per flagship shape on the chip and record the
fastest — fwd+bwd ms per block via jax.grad through the fused-grads op,
20-step scan, np.asarray barrier (block_until_ready doesn't sync on axon).

Usage: python perf/probe20_bwd_g_sweep.py
"""

import functools
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

import ldm_tpu.ops.linear_attention as la  # noqa: E402

HEADS, DIM_HEAD = 4, 32
B2 = 64  # train-step batch (B=64; attention sees B, not 2B, under training)


def make_args(n, c, seed=0):
    ks = jax.random.split(jax.random.key(seed), 8)
    hidden = HEADS * DIM_HEAD
    return (jax.random.normal(ks[0], (B2, n, c), jnp.float32),
            jax.random.normal(ks[1], (c, 3 * hidden), jnp.float32) * 0.1,
            jax.random.normal(ks[2], (hidden, c), jnp.float32) * 0.1,
            jax.random.normal(ks[3], (c,), jnp.float32) * 0.1,
            1 + 0.1 * jax.random.normal(ks[4], (c,), jnp.float32),
            0.1 * jax.random.normal(ks[5], (c,), jnp.float32),
            1 + 0.1 * jax.random.normal(ks[6], (c,), jnp.float32),
            0.1 * jax.random.normal(ks[7], (c,), jnp.float32))


def bench_g(n, c, g):
    """fwd+bwd ms/block with the bwd kernel forced to block_items=g."""
    bwd_orig = la.linear_attention_block_pallas_bwd

    def bwd_forced(*a, **kw):
        kw["block_items"] = g
        return bwd_orig(*a, **kw)

    def _bwd_g(heads, dim_head, eps, compute_dtype, residuals, dy):
        return bwd_forced(residuals[0], dy, *residuals[1:], heads=heads,
                          dim_head=dim_head, eps=eps,
                          compute_dtype=compute_dtype)

    # a fresh custom_vjp op per G (defvjp is write-once per op object)
    @functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
    def op(x, wqkv, wout, bout, g1s, g1b, g2s, g2b, heads, dim_head, eps, cd):
        return la.linear_attention_block_pallas(
            x, wqkv, wout, bout, g1s, g1b, g2s, g2b,
            heads=heads, dim_head=dim_head, eps=eps, compute_dtype=cd)

    def _fwd(x, wqkv, wout, bout, g1s, g1b, g2s, g2b, heads, dim_head, eps, cd):
        y = op(x, wqkv, wout, bout, g1s, g1b, g2s, g2b, heads, dim_head, eps, cd)
        return y, (x, wqkv, wout, bout, g1s, g1b, g2s, g2b)

    op.defvjp(_fwd, _bwd_g)
    args = make_args(n, c)

    def loss(*a):
        y = op(*a, HEADS, DIM_HEAD, 1e-5, jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    grad = jax.grad(loss, argnums=tuple(range(8)))

    @jax.jit
    def many(a):
        def body(c_, _):
            gr = grad(*c_)
            return tuple(x + 1e-6 * gg for x, gg in zip(c_, gr)), ()
        return jax.lax.scan(body, a, None, length=20)[0]

    out = many(args)
    np.asarray(out[0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = many(args)
        np.asarray(out[0])
        times.append(time.perf_counter() - t0)
    return min(times) / 20 * 1e3


def main():
    out = {"device": str(jax.devices()[0]), "B": B2}
    for (n, c, gs) in [(1024, 64, (1, 2, 4)), (256, 128, (4, 8, 16)),
                       (64, 256, (8, 16, 32))]:
        key = f"n{n}_c{c}"
        out[key] = {}
        for g in gs:
            try:
                ms = bench_g(n, c, g)
            except Exception as e:
                ms = None
                out[key][f"g{g}_error"] = str(e)[:200]
            out[key][f"g{g}"] = ms
            print(key, f"G={g}: {ms if ms is None else round(ms, 3)} ms",
                  flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "probe20.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
