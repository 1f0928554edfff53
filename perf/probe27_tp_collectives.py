"""probe27: what collectives does GSPMD actually emit for our TP sharding?

Review finding (round-3): the fused (C, 3H) qkv kernel is column-sharded
P(None, "model"), but the lane-native XLA attention encodes head structure in
a block-diagonal MASK and splits the fused qkv activation at boundaries that
misalign with contiguous n-way chunks for every power-of-2 n — so the claimed
"one all-reduce per attention block" Megatron structure cannot materialize;
GSPMD inserts activation-sized resharding at every site.  This probe compiles
the real UNet forward on a virtual (data=4, model=2) CPU mesh and counts (and
byte-weights) the collectives in the optimized HLO for:

* replicated params (DP baseline — forward should have zero collectives)
* tp + attention_impl="xla" (the lane-native form, round-3 original)
* tp + attention_impl="xla_heads" (the explicit-heads form trainers now force
  on model-parallel meshes)
"""

import json
import os
import re
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from ldm_tpu.models.unet import UNet  # noqa: E402
from ldm_tpu.parallel.fsdp import state_shardings  # noqa: E402
from ldm_tpu.parallel.mesh import create_mesh, data_sharding, replicated  # noqa: E402

COLLECTIVES = ("all-reduce", "all-gather", "collective-permute", "all-to-all",
               "reduce-scatter")
_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
                "f64": 8, "s64": 8}


def collective_stats(hlo: str) -> dict:
    """Count collective-definition sites and sum their output bytes."""
    stats = {c: {"count": 0, "kbytes": 0.0} for c in COLLECTIVES}
    pat = re.compile(
        r"^\s*%?\S+ = (\w+)\[([\d,]*)\][^=]*? (" + "|".join(COLLECTIVES) + r")\(",
        re.M,
    )
    for m in pat.finditer(hlo):
        dt, dims, c = m.group(1), m.group(2), m.group(3)
        size = 1
        for d in dims.split(","):
            if d:
                size *= int(d)
        stats[c]["count"] += 1
        stats[c]["kbytes"] += size * _DTYPE_BYTES.get(dt, 4) / 1024
    for c in stats:
        stats[c]["kbytes"] = round(stats[c]["kbytes"], 1)
    return stats


def main():
    x = jnp.zeros((8, 8, 8, 1), jnp.float32)
    t = jnp.zeros((8,), jnp.int32)
    y = jnp.zeros((8,), jnp.int32)
    mesh = create_mesh(jax.devices()[:8], model=2)

    results = {}
    for mode, impl in (("replicated", "xla"), ("tp_xla", "xla"),
                       ("tp_xla_heads", "xla_heads")):
        model = UNet(in_channels=1, out_channels=1, channels=8,
                     channel_multipliers=(1, 2), num_classes=10,
                     attention_impl=impl)
        params = jax.jit(model.init)(jax.random.key(0), x[:1], t[:1], y[:1])
        sh = (replicated(mesh) if mode == "replicated"
              else state_shardings(mesh, params, "tp"))
        compiled = (
            jax.jit(lambda p, x, t, y: model.apply(p, x, t, y),
                    in_shardings=(sh, data_sharding(mesh), None, None))
            .lower(params, x, t, y).compile()
        )
        stats = collective_stats(compiled.as_text())
        results[mode] = stats
        tot_n = sum(s["count"] for s in stats.values())
        tot_kb = round(sum(s["kbytes"] for s in stats.values()), 1)
        print(f"{mode:>14}: {tot_n} collectives, {tot_kb} KiB moved  "
              + "  ".join(f"{c}={s['count']}/{s['kbytes']}KiB"
                          for c, s in stats.items() if s["count"]))

    # attention sites in this geometry: 2 encoder LinAttn + 1 bottleneck
    # Attention + 2 decoder LinAttn = 5; Megatron-ideal forward = one
    # activation all-reduce per site + small kernel-slice gathers.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "probe27.json"), "w") as f:
        json.dump({"n_attention_sites": 5, "mesh": "data=4 x model=2",
                   "collectives": results}, f, indent=2)


if __name__ == "__main__":
    main()
