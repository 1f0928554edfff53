"""probe41: explicit-SP cost/benefit vs resolution (VERDICT r3 item 2, part 2).

SP (activation_sharding="spatial", parallel/sp_explicit.py) exists because
activations grow quadratically with resolution while params don't; rounds
1-3 only ever drove it at 32px where it has nothing to do.  This probe
measures, on the 8-device virtual CPU mesh (the same harness the SP parity
tests use — no multi-chip hardware in this image), the flagship UNet's
full gradient program at 32/64/128 px:

  dp8_B8   create_mesh()        global B=8  -> 1 img/device, full rows
  sp2_B8   create_mesh(model=2) global B=8  -> 2 img/device, half rows
  sp2_B4   create_mesh(model=2) global B=4  -> 1 img/device, half rows

Two readings per size:
  * step-time overhead at matched global batch (dp8_B8 vs sp2_B8): the
    price of halo exchanges + psum'd GroupNorm + gathered attention.
    CPU wall-clock is directional (8 virtual devices serialize on 1 core),
    but the collective/duplication overhead is structural.
  * per-device memory at matched per-device batch (dp8_B8 vs sp2_B4) from
    compiled.memory_analysis(): when the per-image activation footprint is
    what ends replicated training, row-sharding halves it — "when SP pays"
    is the resolution where dp8's temp bytes outgrow HBM headroom while
    sp2's still fit.

Output: perf/probe41.json
"""

import dataclasses
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
_cache = "/root/repo/runs/.jax_cache_cpu"
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from ldm_tpu.config import load_config  # noqa: E402
from ldm_tpu.factory import build_model  # noqa: E402
from ldm_tpu.parallel.mesh import create_mesh  # noqa: E402
from ldm_tpu.parallel.sp_explicit import (  # noqa: E402
    make_unet_sp_apply, supports_spatial_training,
)

SIZES = [int(s) for s in sys.argv[1:]] or [32, 64, 128]
TIMING_STEPS = 3
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe41.json")

base = load_config("/root/repo/configs/protocol_hard.yaml")


def batch(size, b, mesh, rows_sharded):
    """Global arrays placed on the mesh: batch over data, rows over model."""
    rows = P("data", "model") if rows_sharded else P("data")
    x = jax.random.normal(jax.random.key(1), (b, size, size, 3), jnp.float32)
    t = jax.random.randint(jax.random.key(2), (b,), 0, 400)
    y = (jnp.arange(b, dtype=jnp.int32) * 3) % 11
    tgt = jax.random.normal(jax.random.key(3), x.shape, jnp.float32)
    put = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
    return put(x, rows), put(t, P("data")), put(y, P("data")), put(tgt, rows)


def measure(name, apply_fn, params, args, mesh):
    params = jax.device_put(params, NamedSharding(mesh, P()))
    x, t, y, tgt = args

    def loss(p):
        return jnp.mean((apply_fn(p, x, t, y) - tgt) ** 2)

    grad = jax.jit(jax.grad(loss))
    t0 = time.perf_counter()
    lowered = grad.lower(params)
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    ma = compiled.memory_analysis()
    mem = {
        a: int(getattr(ma, a))
        for a in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes")
        if hasattr(ma, a)
    }
    g = compiled(params)
    jax.block_until_ready(g)  # warmup execution
    t0 = time.perf_counter()
    for _ in range(TIMING_STEPS):
        g = compiled(params)
        jax.block_until_ready(g)
    step_s = (time.perf_counter() - t0) / TIMING_STEPS
    row = {"compile_s": round(compile_s, 1), "step_s": round(step_s, 3),
           "memory": mem}
    print(name, row, flush=True)
    return row


out = {}
if os.path.exists(OUT):
    with open(OUT) as f:
        out = json.load(f)
out.setdefault("note", (
    "8 virtual CPU devices on a 1-core host: step_s is directional "
    "(devices serialize); memory_analysis is per-device for the CPU "
    "executable — the activation-scaling RATIOS are the structural result"
))
out["timing_steps"] = TIMING_STEPS

dp_mesh = create_mesh()          # (data=8,)
sp_mesh = create_mesh(model=2)   # (data=4, model=2)

for size in SIZES:
    cfg = dataclasses.replace(
        base, data=dataclasses.replace(base.data, image_size=size))
    model = build_model(cfg)
    assert supports_spatial_training(
        sp_mesh, size, len(model.channel_multipliers)), size
    x0 = jnp.zeros((1, size, size, 3))
    params = jax.jit(model.init)(
        jax.random.key(0), x0, jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32))
    sp_apply = make_unet_sp_apply(sp_mesh, model)

    row = {}
    row["dp8_B8"] = measure(
        f"{size}px dp8_B8", model.apply, params,
        batch(size, 8, dp_mesh, rows_sharded=False), dp_mesh)
    row["sp2_B8"] = measure(
        f"{size}px sp2_B8", sp_apply, params,
        batch(size, 8, sp_mesh, rows_sharded=True), sp_mesh)
    row["sp2_B4"] = measure(
        f"{size}px sp2_B4", sp_apply, params,
        batch(size, 4, sp_mesh, rows_sharded=True), sp_mesh)
    row["overhead_matched_batch"] = round(
        row["sp2_B8"]["step_s"] / row["dp8_B8"]["step_s"] - 1, 3)
    if "temp_size_in_bytes" in row["dp8_B8"]["memory"]:
        row["temp_bytes_ratio_per_image"] = round(
            row["sp2_B4"]["memory"]["temp_size_in_bytes"]
            / row["dp8_B8"]["memory"]["temp_size_in_bytes"], 3)
    out[f"{size}px"] = row
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)

print(json.dumps(out))
