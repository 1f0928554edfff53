"""Perf probe 10: ConvTranspose(2x2, stride 2) vs Dense + depth-to-space.

With kernel == stride there is no output overlap: each input pixel maps to an
independent 2x2 output patch, so the transposed conv is EXACTLY
``y = depth_to_space(x @ W)`` with W the (C_in, 4*C_out) reshaped kernel —
a full-lane MXU matmul (4*C_out >= 256 lanes at every UNet level) instead of
XLA's transposed-conv lowering.  Decoder shapes of the flagship UNet at
2B=128.  Also: GroupNorm+SiLU+3x3-conv chain timing for the conv levels
(information for the conv-fusion question).
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

ITERS = 300


def scan_ms(fn, x):
    # The op changes shape, so it can't be the scan carry: carry a scalar
    # accumulator instead, and perturb the input per iteration so XLA can't
    # hoist the (otherwise loop-invariant) op out of the loop.
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
# decoder up levels: (H_in, C_in) -> C_out at 2B=128
LEVELS = [(4, 512, 256), (8, 256, 128), (16, 128, 64), (32, 64, 64)]
B = 128
for h, cin, cout in LEVELS:
    x = jax.random.normal(jax.random.key(0), (B, h, h, cin), jnp.bfloat16)
    wt = jax.random.normal(jax.random.key(1), (2, 2, cin, cout), jnp.float32) * 0.1
    wd = wt.transpose(2, 0, 1, 3).reshape(cin, 4 * cout)  # same weights

    def conv_t(x, wt=wt):
        return jax.lax.conv_transpose(
            x, wt.astype(jnp.bfloat16), (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def dense_d2s(x, wd=wd, cout=cout):
        b, hh, ww, c = x.shape
        y = jax.lax.dot_general(
            x, wd.astype(jnp.bfloat16), (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        # (B,H,W,2,2,Cout) -> interleave to (B,2H,2W,Cout)
        y = y.reshape(b, hh, ww, 2, 2, cout)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * hh, 2 * ww, cout)
        return y

    # numeric agreement
    ya = np.asarray(conv_t(x), np.float32)
    yb = np.asarray(dense_d2s(x), np.float32)
    err = np.abs(ya - yb).max() / max(np.abs(ya).max(), 1e-6)

    t_ct = scan_ms(conv_t, x)
    t_dd = scan_ms(dense_d2s, x)
    results[f"h{h}_cin{cin}"] = {
        "convt_ms": round(t_ct, 4), "dense_d2s_ms": round(t_dd, 4),
        "speedup": round(t_ct / t_dd, 2), "rel_err": float(f"{err:.2e}")}
    print(f"h={h} cin={cin}: convT {t_ct:.4f} ms  dense+d2s {t_dd:.4f} ms "
          f"({t_ct / t_dd:.2f}x)  err {err:.1e}", flush=True)

with open("/root/repo/perf/probe10.json", "w") as f:
    json.dump(results, f, indent=2)
print("done", flush=True)
