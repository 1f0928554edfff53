"""On-chip sampling-equivalence check: packed Pallas (auto) vs forced XLA
attention, same trained weights (the protocol run's EMA checkpoint), same PRNG
key.  bf16 reduction reordering makes 400-step trajectories diverge pairwise
(butterfly effect), so equality is asserted DISTRIBUTIONALLY: pixel-feature
FID between the two 100-image sets must be tiny (same order as two disjoint
same-impl batches), and per-class sample means/stds must agree.
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/runs/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")

from ldm_tpu.config import load_config
from ldm_tpu.factory import build_diffusion, build_model
from ldm_tpu.ops.fid import pixel_fid
from ldm_tpu.training import checkpoint as ckpt

cfg = load_config("configs/protocol_cifar10_scale.yaml")
diffusion = build_diffusion(cfg)
B = 100
classes = jnp.arange(B, dtype=jnp.int32) % 10
shape = (32, 32, 3)

sets = {}
for tag, impl in (("auto", None), ("xla", "xla")):
    model = build_model(cfg).clone(attention_impl=impl)
    x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    template = jax.eval_shape(
        lambda: model.init(jax.random.key(0), x0, jnp.zeros((1,), jnp.int32),
                           jnp.zeros((1,), jnp.int32)))
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    params = ckpt.load_params(
        "runs/pixel/protocol_cifar10_scale/checkpoints/diffusion_model_ema.msgpack",
        template)

    @jax.jit
    def run(params, key):
        return diffusion.sample(model.apply, params, key, classes, shape,
                                cfg_scale=cfg.diffusion.cfg_scale,
                                null_label=model.null_label)

    for key_i in (0, 1):
        imgs = np.asarray(run(params, jax.random.key(key_i)), np.float32)
        sets[f"{tag}_k{key_i}"] = imgs
        print(f"{tag} key={key_i}: mean {imgs.mean():.4f} std {imgs.std():.4f}",
              flush=True)

fid_cross = pixel_fid(sets["xla_k0"], sets["auto_k0"])
fid_same_xla = pixel_fid(sets["xla_k0"], sets["xla_k1"])
fid_same_auto = pixel_fid(sets["auto_k0"], sets["auto_k1"])
m_diff = abs(sets["xla_k0"].mean() - sets["auto_k0"].mean())
s_diff = abs(sets["xla_k0"].std() - sets["auto_k0"].std())
out = {
    "pixel_fid_xla_vs_packed_same_key": round(fid_cross, 5),
    "pixel_fid_xla_k0_vs_k1": round(fid_same_xla, 5),
    "pixel_fid_packed_k0_vs_k1": round(fid_same_auto, 5),
    "mean_abs_diff": round(float(m_diff), 5),
    "std_abs_diff": round(float(s_diff), 5),
}
print(json.dumps(out), flush=True)
with open("/root/repo/perf/probe15_equivalence.json", "w") as f:
    json.dump(out, f, indent=2)
# cross-impl FID must be comparable to the same-impl key-to-key FID (sampling
# noise floor), not an order larger
assert fid_cross < 3 * max(fid_same_xla, fid_same_auto) + 1e-3, out
print("equivalence ok", flush=True)
