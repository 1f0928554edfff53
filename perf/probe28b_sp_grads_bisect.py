import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/runs/.jax_cache_cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

from ldm_tpu.parallel.mesh import create_mesh, data_sharding, replicated
from ldm_tpu.parallel.sp import constrain_spatial

mesh = create_mesh(jax.devices()[:8], model=2)


class ConvOnly(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(8, (3, 3), padding=1)(x)
        x = nn.swish(x)
        x = nn.Conv(8, (3, 3), padding=1)(x)
        return x


class ConvGN(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(8, (3, 3), padding=1)(x)
        x = nn.GroupNorm(num_groups=4)(x)
        x = nn.swish(x)
        x = nn.Conv(8, (3, 3), padding=1)(x)
        return x


class ConvPool(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(8, (3, 3), padding=1)(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(8, (3, 3), padding=1)(x)
        x = nn.ConvTranspose(8, (2, 2), strides=(2, 2), padding="VALID")(x)
        x = nn.Conv(1, (1, 1))(x)
        return x


class ConvAttn(nn.Module):
    @nn.compact
    def __call__(self, x):
        from ldm_tpu.models.unet import LinAttnBlock
        x = nn.Conv(8, (3, 3), padding=1)(x)
        x = LinAttnBlock(impl="xla_heads")(x)
        x = nn.Conv(1, (1, 1))(x)
        return x


def check(name, module):
    b, hw = 16, 8
    rng = np.random.default_rng(0)
    x = rng.normal(size=(b, hw, hw, 1)).astype(np.float32)
    tgt = rng.normal(size=(b, hw, hw, module.apply.__self__ and 1 or 1)).astype(np.float32)
    params = jax.jit(module.init)(jax.random.key(0), x[:1])

    def make(sp):
        def f(p, x, tgt):
            xx = constrain_spatial(mesh, x) if sp else x
            out = module.apply(p, xx)
            return jnp.mean((out.astype(jnp.float32) - tgt[..., :out.shape[-1]]) ** 2)
        return jax.jit(jax.value_and_grad(f),
                       in_shardings=(replicated(mesh), data_sharding(mesh),
                                     data_sharding(mesh)))

    l0, g0 = make(False)(params, x, tgt)
    l1, g1 = make(True)(params, x, tgt)
    worst = 0.0
    for a, c in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        a, c = np.asarray(a), np.asarray(c)
        rel = np.abs(a - c).max() / (np.abs(a).max() + 1e-12)
        worst = max(worst, rel)
    print(f"{name}: loss diff {abs(float(l0)-float(l1)):.2e}  worst grad rel {worst:.3e}", flush=True)


check("conv-only ", ConvOnly())
check("conv+GN   ", ConvGN())
check("pool+convT", ConvPool())
check("lin-attn  ", ConvAttn())


class ConvSoftAttn(nn.Module):
    @nn.compact
    def __call__(self, x):
        from ldm_tpu.models.unet import Attention, PreNormResidual
        x = nn.Conv(8, (3, 3), padding=1)(x)
        x = PreNormResidual(Attention())(x)
        x = nn.Conv(1, (1, 1))(x)
        return x


class ConvResNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        from ldm_tpu.models.unet import ResNetBlock, TimeEmbedding
        t = jnp.arange(x.shape[0]) % 4
        temb = TimeEmbedding(32)(t)
        x = nn.Conv(8, (3, 3), padding=1)(x)
        x = ResNetBlock(8)(x, temb)
        x = nn.Conv(1, (1, 1))(x)
        return x


class ConvSkip(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(8, (3, 3), padding=1)(x)
        skip = x
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(8, (3, 3), padding=1)(x)
        x = nn.ConvTranspose(8, (2, 2), strides=(2, 2), padding="VALID")(x)
        x = jnp.concatenate([x, skip], axis=-1)
        x = nn.Conv(1, (1, 1))(x)
        return x


check("soft-attn ", ConvSoftAttn())
check("resblock+t", ConvResNet())
check("skip-cat  ", ConvSkip())
