import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/runs/.jax_cache_cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ldm_tpu.models.unet import UNet
from ldm_tpu.parallel.mesh import create_mesh, data_sharding, replicated
from ldm_tpu.parallel.sp import constrain_spatial

mesh = create_mesh(jax.devices()[:8], model=2)  # (data=4, model=2)

model = UNet(in_channels=1, out_channels=1, channels=16,
             channel_multipliers=(1, 2), num_classes=10,
             attention_impl="xla_heads")
b, hw = 16, 8
rng = np.random.default_rng(0)
x = rng.normal(size=(b, hw, hw, 1)).astype(np.float32)
t = rng.integers(0, 4, size=(b,)).astype(np.int32)
y = rng.integers(0, 10, size=(b,)).astype(np.int32)
tgt = rng.normal(size=x.shape).astype(np.float32)

params = jax.jit(model.init)(jax.random.key(0), x[:1], t[:1], y[:1])

def make(sp):
    def f(p, x, t, y, tgt):
        xx = constrain_spatial(mesh, x) if sp else x
        out = model.apply(p, xx, t, y)
        loss = jnp.mean((out - tgt) ** 2)
        return loss, out
    def g(p, x, t, y, tgt):
        (loss, out), grads = jax.value_and_grad(f, has_aux=True)(p, x, t, y, tgt)
        return loss, out, grads
    return g

dat = data_sharding(mesh)
args_sh = (replicated(mesh), dat, dat, dat, dat)
ref = jax.jit(make(False), in_shardings=args_sh)
sp = jax.jit(make(True), in_shardings=args_sh)

l0, o0, g0 = ref(params, x, t, y, tgt)
l1, o1, g1 = sp(params, x, t, y, tgt)
o0, o1 = np.asarray(o0), np.asarray(o1)
print("loss", float(l0), float(l1), "diff", abs(float(l0) - float(l1)))
print("fwd max abs diff", np.abs(o0 - o1).max(), "out scale", np.abs(o0).max())

flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
flat1 = jax.tree_util.tree_leaves(g1)
bad = 0
for (path, a), c in zip(flat0, flat1):
    a, c = np.asarray(a), np.asarray(c)
    d = np.abs(a - c).max()
    rel = d / (np.abs(a).max() + 1e-12)
    if rel > 1e-4:
        bad += 1
        print(f"GRADDIFF {jax.tree_util.keystr(path)} maxabs={d:.3e} rel={rel:.3e}")
print("bad leaves:", bad, "/", len(flat1))
