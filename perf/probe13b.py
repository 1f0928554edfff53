"""Perf probe 13b: stage ablation of the fused ResNet-block kernel at the
encL0 shape (2B=256, 32x32, 64->64, bf16) — where does the 1.6 ms go?

Variants (same I/O, math bogus for the ablated stages — timing only):
  full      — the committed kernel (patches concat + one K=576 matmul per conv)
  accum     — convs as 9 accumulating (M,64)x(64,64) matmuls, no lane concat
  center    — convs as ONE center-tap matmul (no shifts/masks/concat): lower
              bound with both GNs + 2 small matmuls
  gnonly    — no convs at all: GN/SiLU/temb/shortcut only
  noop      — copy in->out: grid + DMA floor
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

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldm_tpu.ops.resnet_block import (
    _conv3x3_patches, _group_affine_f32, _shift_rows, _tap_masks,
)

ITERS = 300
B = 256
S = 32
C = 64
DT = jnp.bfloat16


def kernel(x_ref, temb_ref, n1s_ref, n1b_ref, w1_ref, b1_ref, n2s_ref,
           n2b_ref, w2_ref, b2_ref, o_ref, *, g, mode):
    cd = DT
    f32 = jnp.float32
    n = S * S
    gn = g * n
    if mode == "noop":
        o_ref[...] = x_ref[...]
        return
    x = x_ref[...].reshape(gn, C)
    n1s = n1s_ref[...].astype(f32)
    n1b = n1b_ref[...].astype(f32)
    n2s = n2s_ref[...].astype(f32)
    n2b = n2b_ref[...].astype(f32)

    def gn_silu(t, s_row, b_row):
        slabs = []
        for gi in range(g):
            sl = t[gi * n : (gi + 1) * n].astype(f32)
            y = _group_affine_f32(sl, s_row, b_row, 8, 1e-5)
            slabs.append((y * jax.nn.sigmoid(y)).astype(cd))
        return jnp.concatenate(slabs, axis=0) if g > 1 else slabs[0]

    def conv(t, w_ref, b_ref):
        w = w_ref[...].astype(cd)  # (9C, C)
        if mode in ("full",):
            masks = _tap_masks(gn, S, cd)
            patches = _conv3x3_patches(t, S, masks)
            acc = jnp.dot(patches, w, preferred_element_type=f32)
        elif mode == "accum":
            masks = _tap_masks(gn, S, cd)
            acc = None
            i = 0
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    piece = _shift_rows(t, dy * S + dx) * masks[(dy, dx)]
                    d = jnp.dot(piece, w[i * C : (i + 1) * C],
                                preferred_element_type=f32)
                    acc = d if acc is None else acc + d
                    i += 1
        elif mode in ("center", "gnonly"):
            acc = jnp.dot(t, w[4 * C : 5 * C], preferred_element_type=f32)
            if mode == "gnonly":
                acc = t.astype(f32)
        return acc.astype(cd) + b_ref[...].astype(cd)

    h = conv(gn_silu(x, n1s, n1b), w1_ref, b1_ref)
    i = pl.program_id(0)
    temb = temb_ref[pl.ds(i * g, g), :].astype(cd)
    slabs = []
    for gi in range(g):
        sl = (h[gi * n : (gi + 1) * n] + temb[gi : gi + 1]).astype(f32)
        y = _group_affine_f32(sl, n2s, n2b, 8, 1e-5)
        slabs.append((y * jax.nn.sigmoid(y)).astype(cd))
    h2 = jnp.concatenate(slabs, axis=0) if g > 1 else slabs[0]
    c2 = conv(h2, w2_ref, b2_ref).astype(f32)
    o_ref[...] = (c2 + x.astype(f32)).astype(o_ref.dtype).reshape(g, n, C)


def run_mode(mode, g):
    n = S * S
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, n, C) * 0.5, DT)
    temb = jnp.asarray(rng.randn(B, C) * 0.1, jnp.float32)
    rowf = lambda m: jnp.asarray(rng.randn(1, m) * 0.1, jnp.float32)  # noqa
    w = lambda: jnp.asarray(rng.randn(9 * C, C) / 24.0, jnp.float32)  # noqa
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),  # noqa
                                      memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(kernel, g=g, mode=mode),
        grid=(B // g,),
        in_specs=[
            pl.BlockSpec((g, n, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full((B, C)), full((1, C)), full((1, C)), full((9 * C, C)),
            full((1, C)), full((1, C)), full((1, C)), full((9 * C, C)),
            full((1, C)),
        ],
        out_specs=pl.BlockSpec((g, n, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, C), DT),
    )
    args = (x, temb, rowf(C), rowf(C), w(), rowf(C), rowf(C), rowf(C), w(),
            rowf(C))

    @jax.jit
    def scan(x0):
        def step(acc, i):
            y = f(x0 * (1.0 + i.astype(x0.dtype) * 1e-6), *args[1:])
            return acc + y.astype(jnp.float32).mean(), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(ITERS, dtype=jnp.int32))
        return acc

    np.asarray(scan(x))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(scan(x))
        times.append(time.perf_counter() - t0)
    return min(times) / ITERS * 1e3


results = {}
for mode in ("noop", "gnonly", "center", "accum", "full"):
    for g in (1, 2):
        try:
            ms = run_mode(mode, g)
            results[f"{mode}_g{g}"] = round(ms, 4)
            print(f"{mode} g={g}: {ms:.4f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            results[f"{mode}_g{g}"] = f"FAIL {type(e).__name__}"
            print(f"{mode} g={g}: FAIL {str(e)[:150]}", flush=True)

with open("/root/repo/perf/probe13b.json", "w") as fjson:
    json.dump(results, fjson, indent=2)
print("done", flush=True)
