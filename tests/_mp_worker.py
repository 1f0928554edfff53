"""Worker for the 2-process distributed-CPU test (tests/test_multiprocess.py).

Each process sees 2 local virtual CPU devices; after
``jax.distributed.initialize`` the global mesh spans 4.  Runs one epoch of the
real DiffusionTrainer (epoch-as-scan + per-batch val) over the global mesh plus
an explicit DP-vs-local-loss parity check, then prints machine-readable results
for the parent to compare across processes.

Usage: python _mp_worker.py <coordinator> <num_processes> <process_id> <workdir>
       [param_sharding]

With ``param_sharding=fsdp`` the state is ZeRO-sharded ACROSS the two
processes, so checkpoint writes exercise the collective process_allgather
path in training/checkpoint.py (leaves are not fully addressable from any
single process).  With ``param_sharding=tp`` the mesh is (data=hosts,
model=2 local devices): attention heads TP-sharded inside each host, DP
across hosts — the standard pod layout.
"""

import os
import sys

coordinator, num_processes, process_id, workdir = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)
param_sharding = sys.argv[5] if len(sys.argv) > 5 else "replicated"

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from ldm_tpu.parallel import distributed  # noqa: E402

assert distributed.initialize(
    coordinator_address=coordinator,
    num_processes=num_processes,
    process_id=process_id,
)
assert jax.process_count() == num_processes
assert jax.device_count() == 2 * num_processes, jax.devices()
assert len(jax.local_devices()) == 2

import numpy as np  # noqa: E402

from ldm_tpu.config import Config, DataConfig, DiffusionConfig, ModelConfig  # noqa: E402
from ldm_tpu.data.datasets import synthetic_dataset  # noqa: E402
from ldm_tpu.data.loader import DataLoader  # noqa: E402
from ldm_tpu.factory import build_diffusion, build_model  # noqa: E402
from ldm_tpu.parallel.mesh import create_mesh, shard_batch  # noqa: E402
from ldm_tpu.training.diffusion_trainer import DiffusionTrainer  # noqa: E402

# tp/fsdp_tp: model axis = the 2 local devices of each host (TP rides the
# fast intra-host links), data axis = across hosts — the standard layout
mesh = (create_mesh(model=2) if param_sharding in ("tp", "fsdp_tp")
        else create_mesh())
assert mesh.devices.size == 2 * num_processes

cfg = Config(
    project_name="mp", workdir=workdir, epochs=1, batch_size=8,
    use_amp=False, seed=0, sample_every=0, param_sharding=param_sharding,
    model=ModelConfig(params=dict(
        in_channels=1, out_channels=1, channels=8,
        channel_multipliers=[1], num_classes=10,
    )),
    diffusion=DiffusionConfig(n_steps=4),
    data=DataConfig(dataset="SYNTHETIC", image_size=8, image_channels=1),
)
ds = synthetic_dataset(16, 8, 1, seed=0)
tr = DiffusionTrainer(
    cfg, build_model(cfg), build_diffusion(cfg),
    DataLoader(ds, 8, seed=0), DataLoader(ds, 8, seed=1),
    classes=list(range(10)), mesh=mesh,
)

# Parity: the DP eval loss over the global mesh must equal the loss computed
# entirely on THIS process's local device from the same host batch.
batch = {
    "image": (ds.images[:8].astype(np.float32) / 255.0) * 2.0 - 1.0,
    "label": ds.labels[:8].astype(np.int32),
    "index": np.zeros((8,), np.int32),
}
dp_loss = float(tr._eval_step(tr.state, shard_batch(mesh, batch))["loss"])

import jax.numpy as jnp  # noqa: E402

if param_sharding == "replicated":
    # device_get of a cross-process-sharded state is impossible by design;
    # the fsdp run checks numerics via the checkpoint roundtrip below instead.
    local_state = jax.device_get(tr.state)

    def local_eval(params, key, image, label):
        eps, xt, t = tr.diffusion.noise_batch(key, image)
        eps_theta = tr.model.apply(params, xt, t, label)
        # mirror _eval_step's cfg path with cfg=3.0
        null = tr.model.num_classes
        eps_u = tr.model.apply(params, xt, t, jnp.full_like(label, null))
        eps_theta = eps_u + 3.0 * (eps_theta - eps_u)
        return jnp.mean((eps.astype(jnp.float32) - eps_theta) ** 2)

    key = jax.random.fold_in(jax.random.fold_in(tr.state.key, 0x5EED), 0)
    k_noise, _ = jax.random.split(key)
    ref_loss = float(jax.jit(local_eval)(
        local_state.params, k_noise, jnp.asarray(batch["image"]),
        jnp.asarray(batch["label"]),
    ))
    assert abs(dp_loss - ref_loss) < 1e-5, (dp_loss, ref_loss)

# Per-host sharded data feed (VERDICT r2 item 8): each process holds ONLY its
# p::P subset and supplies its contiguous row block of the global batch via
# local_to_global — the assembled global batch must equal shard_batch of the
# full host batch row-for-row on this process's addressable shards.
from ldm_tpu.parallel.mesh import data_sharding  # noqa: E402

local_ds = distributed.per_host_subset(ds)
assert len(local_ds) == len(ds) // num_processes
n_local_rows = 8 // num_processes  # this host's slice of a global batch of 8
local_batch = {
    "image": (local_ds.images[:n_local_rows].astype(np.float32) / 255.0) * 2 - 1,
    "label": local_ds.labels[:n_local_rows].astype(np.int32),
}
g = distributed.tree_local_to_global(data_sharding(mesh), local_batch)
assert g["image"].shape[0] == 8
for shard in g["image"].addressable_shards:
    start = shard.index[0].start or 0
    np.testing.assert_allclose(
        np.asarray(shard.data),
        local_batch["image"][start - process_id * n_local_rows
                             : start - process_id * n_local_rows
                             + shard.data.shape[0]],
    )
# and the global batch runs through the real eval step
g["index"] = distributed.tree_local_to_global(
    data_sharding(mesh), np.zeros((n_local_rows,), np.int32)
)
ph_loss = float(tr._eval_step(tr.state, g)["loss"])
assert np.isfinite(ph_loss)

# One full epoch through the real trainer (scan-epoch fast path + per-batch val
# + process-0-only checkpoints/metrics).  Under fsdp the end-of-train
# save_latest already exercised the collective process_allgather in
# checkpoint.save_state (leaves span both processes).
hist = tr.train()

extra = ""
if param_sharding == "fsdp":
    from jax.experimental import multihost_utils

    leaves = jax.tree.leaves(tr.state.params)
    # the check is only meaningful if some leaf really spans both processes
    assert any(not x.is_fully_addressable for x in leaves), (
        "fsdp state unexpectedly fully addressable — gather path untested"
    )

    def gathered(tree):
        return [
            np.asarray(multihost_utils.process_allgather(x, tiled=True))
            if not (x.is_fully_addressable or x.sharding.is_fully_replicated)
            else np.asarray(x)
            for x in jax.tree.leaves(tree)
        ]

    before = gathered(tr.state.params)
    # process 0 wrote state.msgpack at train end; barrier so process 1 can't
    # read a half-written file
    multihost_utils.sync_global_devices("ckpt_written")
    path = os.path.join(workdir, "pixel", "mp", "checkpoints", "state.msgpack")
    assert os.path.exists(path), path
    tr.load_state(path)
    # restored state is re-sharded (not replicated) and bitwise-identical
    assert any(not x.is_fully_addressable
               for x in jax.tree.leaves(tr.state.params))
    for a, b in zip(before, gathered(tr.state.params)):
        np.testing.assert_array_equal(a, b)
    extra = f" pdigest={sum(float(np.abs(a).sum()) for a in before):.6f}"

print(f"MPRESULT {process_id} train={hist['train_loss'][0]:.8f} "
      f"val={hist['val_loss'][0]:.8f} dp_eval={dp_loss:.8f} "
      f"perhost_eval={ph_loss:.8f} step={int(tr.state.step)}{extra}",
      flush=True)
