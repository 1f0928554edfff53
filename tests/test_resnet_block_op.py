"""Fused ResNet-block op (ldm_tpu/ops/resnet_block.py): XLA path vs the flax
composition, Pallas kernel (interpret) vs XLA, and gradient flow.

The Pallas kernel is a documented NEGATIVE perf result (docs/perf_round2.md
§8: it cannot beat XLA's batch-in-lanes convs from the channel-minor layout)
and is not wired into the UNet — these tests keep the op correct as the
record of that investigation.
"""

import jax
import jax.nn as jnn
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tpu.models.unet import ResNetBlock
from ldm_tpu.ops.resnet_block import (
    prefer_pallas_resnet,
    resnet_block,
    resnet_block_pallas,
    resnet_block_xla,
)


def _flax_and_args(cin, cout, seed=0, b=4, s=8, d_time=64):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, s, s, cin), jnp.float32)
    traw = jnp.asarray(rng.randn(b, d_time), jnp.float32)
    mod = ResNetBlock(cout)
    params = mod.init(jax.random.key(seed), x, traw)
    p = params["params"]
    temb = jnp.dot(jnn.silu(traw), p["Dense_0"]["kernel"]) + p["Dense_0"]["bias"]
    use_sc = cin != cout
    args = (
        x, temb,
        p["Block_0"]["GroupNorm_0"]["scale"], p["Block_0"]["GroupNorm_0"]["bias"],
        p["Block_0"]["Conv_0"]["kernel"], p["Block_0"]["Conv_0"]["bias"],
        p["Block_1"]["GroupNorm_0"]["scale"], p["Block_1"]["GroupNorm_0"]["bias"],
        p["Block_1"]["Conv_0"]["kernel"], p["Block_1"]["Conv_0"]["bias"],
        p["Conv_0"]["kernel"][0, 0] if use_sc else jnp.zeros((1, 1), x.dtype),
        p["Conv_0"]["bias"] if use_sc else jnp.zeros((1, 1), x.dtype),
    )
    want = mod.apply(params, x, traw)
    return args, want, use_sc


@pytest.mark.parametrize("cin,cout", [(16, 24), (16, 16)])
def test_xla_path_matches_flax(cin, cout):
    args, want, use_sc = _flax_and_args(cin, cout)
    got = resnet_block_xla(*args, groups=8, compute_dtype=jnp.float32,
                           use_shortcut=use_sc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("g", [1, 2, 4])
@pytest.mark.parametrize("cin,cout", [(16, 24), (16, 16)])
def test_pallas_interpret_matches_flax(cin, cout, g):
    args, want, use_sc = _flax_and_args(cin, cout, seed=1)
    got = resnet_block_pallas(*args, groups=8, compute_dtype=jnp.float32,
                              use_shortcut=use_sc, interpret=True,
                              block_items=g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_gradients_flow_through_xla_vjp():
    """The custom-VJP op's backward recomputes through the XLA path — grads
    must match differentiating resnet_block_xla directly."""
    args, _, use_sc = _flax_and_args(16, 24, seed=2)

    def loss_pallas(x, w1):
        from jax.experimental.pallas import tpu as pltpu
        a = (x, args[1], args[2], args[3], w1) + args[5:]
        with pltpu.force_tpu_interpret_mode():
            y = resnet_block(*a, 8, 1e-5, jnp.float32, use_sc)
        return jnp.sum(y * y)

    def loss_xla(x, w1):
        a = (x, args[1], args[2], args[3], w1) + args[5:]
        return jnp.sum(resnet_block_xla(
            *a, groups=8, compute_dtype=jnp.float32, use_shortcut=use_sc) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(args[0], args[4])
    gx = jax.grad(loss_xla, argnums=(0, 1))(args[0], args[4])
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_prefer_gating_cpu_false():
    assert not prefer_pallas_resnet(256, 1024, 64, 64)  # cpu backend here
