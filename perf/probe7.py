"""Perf probe 7: stage ablation inside the multi-item Pallas kernel (L1 shape).

probe6 put the fused kernel at 0.57 ms vs XLA 0.48 ms at (128, 1024, 64) —
while an HBM-traffic model says XLA is bandwidth-bound on ~300 MB of
materialized intermediates (~370 us) and a VMEM-resident kernel should land
near ~150 us.  Something inside the kernel is slow.  This probe compiles
truncated kernel variants (stage 1..6) and times each; deltas = per-stage cost.

Stages: 1 GN1 only | 2 +qkv dots | 3 +q softmax path | 4 +k path |
        5 +ctx/ctx_w/out matmuls | 6 full (GN2 + residual) == production.
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

HEADS, DIM_HEAD, HIDDEN = 4, 32, 128
ITERS = 300


def _kernel(x_ref, wqkv_ref, wout_ref, bout_ref, g1s_ref, g1b_ref, g2s_ref,
            g2b_ref, o_ref, *, stage, eps=1e-5, cd=jnp.bfloat16):
    f32 = jnp.float32
    g, n, c = x_ref.shape
    gn = g * n
    hidden = HIDDEN
    dim_head = DIM_HEAD
    x = x_ref[...].reshape(gn, c)
    xf = x.astype(f32)

    s_row = jax.lax.broadcasted_iota(jnp.int32, (g, gn), 0)
    s_col = jax.lax.broadcasted_iota(jnp.int32, (g, gn), 1) // n
    S = (s_row == s_col).astype(f32)
    St = S.T

    def per_item_affine(t, scale_row, bias_row):
        ssum = jnp.dot(S, t, preferred_element_type=f32)
        ssq = jnp.dot(S, t * t, preferred_element_type=f32)
        mu = ssum.sum(axis=-1, keepdims=True) / (n * c)
        var = ssq.sum(axis=-1, keepdims=True) / (n * c) - mu * mu
        inv = jax.lax.rsqrt(var + eps)
        a = inv * scale_row
        b = (bias_row - mu * inv * scale_row) + jnp.zeros((g, c), f32)
        a_row = jnp.dot(St, a, preferred_element_type=f32)
        b_row = jnp.dot(St, b, preferred_element_type=f32)
        return t * a_row + b_row

    h = per_item_affine(xf, g1s_ref[...].astype(f32), g1b_ref[...].astype(f32))
    h = h.astype(cd)
    if stage == 1:
        o_ref[...] = (xf + h.astype(f32)[:, :c]).astype(o_ref.dtype).reshape(g, n, c)
        return

    wqkv = wqkv_ref[...].astype(cd)
    q = jnp.dot(h, wqkv[:, :hidden], preferred_element_type=f32)
    k = jnp.dot(h, wqkv[:, hidden:2 * hidden], preferred_element_type=f32)
    v = jnp.dot(h, wqkv[:, 2 * hidden:], preferred_element_type=f32).astype(cd)
    if stage == 2:
        o_ref[...] = (xf + (q + k + v.astype(f32))[:, :c]).astype(
            o_ref.dtype).reshape(g, n, c)
        return

    row_h = jax.lax.broadcasted_iota(jnp.int32, (hidden, hidden), 0) // dim_head
    col_h = jax.lax.broadcasted_iota(jnp.int32, (hidden, hidden), 1) // dim_head
    seg = (row_h == col_h).astype(cd)

    q = q.astype(cd)
    q_shift = q.astype(f32).max(axis=-1, keepdims=True).astype(cd)
    q_e = jnp.exp(q - q_shift)
    q_sum = jnp.dot(q_e, seg, preferred_element_type=f32)
    q = (q_e.astype(f32) / q_sum * (dim_head**-0.5)).astype(cd)
    if stage == 3:
        o_ref[...] = (xf + (q.astype(f32) + k + v.astype(f32))[:, :c]).astype(
            o_ref.dtype).reshape(g, n, c)
        return

    k = k.astype(cd)
    k_shift = k.astype(f32).max(axis=0, keepdims=True).astype(cd)
    k_e = jnp.exp(k - k_shift)
    k_sum = jnp.dot(S, k_e.astype(f32), preferred_element_type=f32)
    k_norm = (k_e.astype(f32)
              * jnp.dot(St, 1.0 / k_sum, preferred_element_type=f32)).astype(cd)
    if stage == 4:
        o_ref[...] = (xf + (q.astype(f32) + k_norm.astype(f32)
                            + v.astype(f32))[:, :c]).astype(
            o_ref.dtype).reshape(g, n, c)
        return

    ctx = jax.lax.dot_general(
        k_norm.reshape(g, n, hidden), v.reshape(g, n, hidden),
        (((1,), (1,)), ((0,), (0,))), preferred_element_type=f32)
    ctx = (ctx.reshape(g * hidden, hidden)
           * jnp.tile(seg.astype(f32), (g, 1))).astype(cd)
    ctx_w = jnp.dot(ctx, wout_ref[...].astype(cd),
                    preferred_element_type=f32).astype(cd)
    out = jax.lax.dot_general(
        q.reshape(g, n, hidden), ctx_w.reshape(g, hidden, c),
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32).reshape(gn, c)
    out = out + bout_ref[...].astype(f32)
    if stage == 5:
        o_ref[...] = (xf + out).astype(o_ref.dtype).reshape(g, n, c)
        return

    o = per_item_affine(out, g2s_ref[...].astype(f32), g2b_ref[...].astype(f32))
    o_ref[...] = (xf + o).astype(o_ref.dtype).reshape(g, n, c)


def build(stage, b, n, c, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(_kernel, stage=stage)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    row = lambda p: p.reshape(1, -1)  # noqa: E731

    def fn(x, w):
        wqkv, wout, bout, g1s, g1b, g2s, g2b = w
        return pl.pallas_call(
            kernel, grid=(b // g,),
            in_specs=[pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      full(wqkv.shape), full(wout.shape), full((1, c)),
                      full((1, c)), full((1, c)), full((1, c)), full((1, c))],
            out_specs=pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        )(x, wqkv, wout, row(bout), row(g1s), row(g1b), row(g2s), row(g2b))
    return fn


def main():
    b, n, c = 128, 1024, 64
    ks = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(ks[0], (b, n, c), jnp.bfloat16)
    w = (jax.random.normal(ks[1], (c, 3 * HIDDEN), jnp.float32) * 0.2,
         jax.random.normal(ks[2], (HIDDEN, c), jnp.float32) * 0.2,
         jnp.zeros((c,), jnp.float32), jnp.ones((c,)), jnp.zeros((c,)),
         jnp.ones((c,)), jnp.zeros((c,)))

    results = {}
    for g in (2, 4):
        prev = 0.0
        for stage in (1, 2, 3, 4, 5, 6):
            fn = build(stage, b, n, c, g)

            @jax.jit
            def run(x):
                def step(x, _):
                    return fn(x, w), None
                y, _ = jax.lax.scan(step, x, None, length=ITERS)
                return y.astype(jnp.float32).mean()

            np.asarray(run(x))
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(run(x))
                times.append(time.perf_counter() - t0)
            ms = min(times) / ITERS * 1e3
            results[f"g{g}_stage{stage}"] = {
                "ms": round(ms, 4), "delta_ms": round(ms - prev, 4)}
            print(f"g={g} stage={stage}: {ms:.4f} ms (+{ms - prev:.4f})",
                  flush=True)
            prev = ms
            with open("/root/repo/perf/probe7.json", "w") as f:
                json.dump(results, f, indent=2)
    print("done", flush=True)


if __name__ == "__main__":
    main()
