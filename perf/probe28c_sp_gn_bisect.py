import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ldm_tpu.parallel.mesh import create_mesh, data_sharding, replicated
from ldm_tpu.parallel.sp import constrain_spatial

mesh = create_mesh(jax.devices()[:8], model=2)

class M(nn.Module):
    fast: bool
    groups: int = 8
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(8, (3, 3), padding=1)(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         use_fast_variance=self.fast)(x)
        x = nn.Conv(1, (1, 1))(x)
        return x

def check(name, module):
    b, hw = 16, 8
    rng = np.random.default_rng(0)
    x = rng.normal(size=(b, hw, hw, 1)).astype(np.float32)
    tgt = rng.normal(size=(b, hw, hw, 1)).astype(np.float32)
    params = jax.jit(module.init)(jax.random.key(0), x[:1])
    def make(sp):
        def f(p, x, tgt):
            xx = constrain_spatial(mesh, x) if sp else x
            return jnp.mean((module.apply(p, xx) - tgt) ** 2)
        return jax.jit(jax.value_and_grad(f),
                       in_shardings=(replicated(mesh), data_sharding(mesh), data_sharding(mesh)))
    l0, g0 = make(False)(params, x, tgt)
    l1, g1 = make(True)(params, x, tgt)
    worst, wname = 0.0, ""
    for (path, a), c in zip(jax.tree_util.tree_flatten_with_path(g0)[0], jax.tree.leaves(g1)):
        a, c = np.asarray(a), np.asarray(c)
        rel = np.abs(a - c).max() / (np.abs(a).max() + 1e-12)
        if rel > worst: worst, wname = rel, jax.tree_util.keystr(path)
    print(f"{name}: loss diff {abs(float(l0)-float(l1)):.2e} worst {worst:.3e} at {wname}", flush=True)

check("gn8 fast=True ", M(fast=True))
check("gn8 fast=False", M(fast=False))
check("gn4 fast=True ", M(fast=True, groups=4))
