"""Tensor-parallel (Megatron-style attention) tests on a 4x2 virtual mesh.

TP shards each attention block's head group over the ``model`` axis
(parallel/tp.py): qkv kernels on their output dim, output projections on
their input dim, one GSPMD all-reduce per block. Contract: identical numbers
to single-device training, with the qkv/proj params actually model-sharded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ldm_tpu.parallel.mesh import create_mesh, replicated
from ldm_tpu.parallel.tp import tp_shardings

from tests.test_fsdp import _run_trainer


def _tp_mesh():
    return create_mesh(model=2)  # 8 devices -> (data=4, model=2)


def test_tp_rule_targets_attention_only():
    mesh = _tp_mesh()
    params = {
        "LinAttnBlock_0": {"qkv_kernel": jnp.zeros((32, 384)),
                           "out_kernel": jnp.zeros((128, 32)),
                           "norm_pre_scale": jnp.zeros((32,))},
        "Attention_0": {"Dense_0": {"kernel": jnp.zeros((32, 384))},
                        "Dense_1": {"kernel": jnp.zeros((128, 32)),
                                    "bias": jnp.zeros((32,))}},
        # a ResNetBlock's time-emb projection shares the Dense_0 name but
        # sits outside an Attention scope -> replicated
        "ResNetBlock_0": {"Dense_0": {"kernel": jnp.zeros((32, 32))}},
        "Conv_0": {"kernel": jnp.zeros((3, 3, 32, 32))},
    }
    tree = tp_shardings(mesh, params)
    assert tree["LinAttnBlock_0"]["qkv_kernel"].spec == P(None, "model")
    assert tree["LinAttnBlock_0"]["out_kernel"].spec == P("model", None)
    assert tree["LinAttnBlock_0"]["norm_pre_scale"] == replicated(mesh)
    assert tree["Attention_0"]["Dense_0"]["kernel"].spec == P(None, "model")
    assert tree["Attention_0"]["Dense_1"]["kernel"].spec == P("model", None)
    assert tree["Attention_0"]["Dense_1"]["bias"] == replicated(mesh)
    assert tree["ResNetBlock_0"]["Dense_0"]["kernel"] == replicated(mesh)
    assert tree["Conv_0"]["kernel"] == replicated(mesh)


@pytest.mark.slow
def test_tp_training_matches_single_device(tmp_path):
    """DP(4) x TP(2) training must reproduce the single-device loss history
    and final params — the head-group split plus its per-block all-reduce is
    arithmetic-equivalent to the unsharded program."""
    h1, t1 = _run_trainer(None, str(tmp_path / "single"))
    h2, t2 = _run_trainer(_tp_mesh(), str(tmp_path / "tp"),
                          param_sharding="tp")
    np.testing.assert_allclose(h1["train_loss"], h2["train_loss"], rtol=1e-5)
    np.testing.assert_allclose(h1["val_loss"], h2["val_loss"], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


@pytest.mark.slow
def test_tp_params_are_model_sharded_and_sampling_works(tmp_path):
    _, tr = _run_trainer(_tp_mesh(), str(tmp_path / "t"), param_sharding="tp")
    qkv = tr.state.params["params"]["LinAttnBlock_0"]["qkv_kernel"]
    assert qkv.sharding.spec == P(None, "model")
    shard = qkv.addressable_shards[0].data
    assert shard.shape[-1] * 2 == qkv.shape[-1]
    # the trainer forced the XLA attention path (Pallas custom calls can't be
    # head-partitioned by GSPMD)
    assert tr.model.attention_impl == "xla_heads"
    imgs = tr.sample(list(range(8)), cfg_scale=3.0)
    assert imgs.shape[0] == 8 and imgs.dtype == np.uint8


@pytest.mark.slow
def test_fsdp_tp_2d_matches_single_device(tmp_path):
    """The 2D composition (attention TP over model, ZeRO over data for the
    rest) must also be numerics-invariant, with both placements active."""
    h1, t1 = _run_trainer(None, str(tmp_path / "single"))
    h2, t2 = _run_trainer(_tp_mesh(), str(tmp_path / "2d"),
                          param_sharding="fsdp_tp")
    np.testing.assert_allclose(h1["train_loss"], h2["train_loss"], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
    p = t2.state.params["params"]
    assert p["LinAttnBlock_0"]["qkv_kernel"].sharding.spec == P(None, "model")
    # a conv kernel big enough for the FSDP rule is data-sharded
    from ldm_tpu.parallel.fsdp import MIN_SHARD_SIZE
    convs = [v["Conv_0"]["kernel"] for k, v in p.items()
             if k.startswith("ResNetBlock_")
             for v in [v["Block_0"]] if v["Conv_0"]["kernel"].size >= MIN_SHARD_SIZE]
    assert convs and any("data" in str(c.sharding.spec) for c in convs)
