"""probe36 prep: retrain the 32px CD teacher + exp1 classifier checkpoints.

The round-3 protocol_hard teacher EMA + exp1 classifier msgpacks that
probe36_cd_sweep.py distills from were lost with the session-recycled
working tree.  This recreates them at the same recipe (protocol_hard.yaml,
the round-3 protocol's training phase) so the sweep can run:

  runs/pixel/protocol_hard/checkpoints/diffusion_model_ema.msgpack
  runs/pixel/protocol_hard_classifier/checkpoints/resnet_exp1.msgpack

Usage: python perf/probe36_prep.py [diffusion_epochs]
"""

import dataclasses
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
jax.config.update("jax_compilation_cache_dir", "/root/repo/runs/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from ldm_tpu.config import load_config  # noqa: E402
from ldm_tpu.data.datasets import synthetic_dataset_hard  # noqa: E402
from ldm_tpu.data.loader import DataLoader  # noqa: E402
from ldm_tpu.factory import build_classifier, build_diffusion, build_model  # noqa: E402
from ldm_tpu.training.diffusion_trainer import DiffusionTrainer  # noqa: E402
from ldm_tpu.training.resnet_trainer import ResNetTrainer  # noqa: E402

config = load_config("/root/repo/configs/protocol_hard.yaml")
if len(sys.argv) > 1:
    config.epochs = int(sys.argv[1])

n_total = config.data.synthetic_size
ds = synthetic_dataset_hard(n_total, 32, 3, seed=0)
n_val = int(n_total * config.data.val_split)
perm = np.random.default_rng(config.seed).permutation(n_total)

model = build_model(config)
diffusion = build_diffusion(config)
trainer = DiffusionTrainer(
    config, model, diffusion,
    DataLoader(ds.subset(perm[n_val:]), config.batch_size, seed=config.seed),
    DataLoader(ds.subset(perm[:n_val]), config.batch_size, seed=config.seed + 1),
    classes=list(range(10)),
)
print(f"teacher: {len(ds) - n_val} imgs, {config.epochs} epochs max", flush=True)
t0 = time.perf_counter()
hist = trainer.train()
print(f"teacher trained: {int(trainer.state.step)} steps in "
      f"{time.perf_counter() - t0:.1f}s, val {hist['val_loss'][-1]:.4f}",
      flush=True)

clf_cfg = dataclasses.replace(config, loss_fn="cross-entropy", epochs=8,
                              project_name=config.project_name + "_classifier")
clf_ds = synthetic_dataset_hard(n_total, 32, 3, seed=1)
clf_val = synthetic_dataset_hard(5000, 32, 3, seed=2, train=False)
ctrainer = ResNetTrainer(
    clf_cfg, build_classifier(clf_cfg, 3, 10),
    DataLoader(clf_ds, clf_cfg.batch_size, seed=7),
    DataLoader(clf_val, clf_cfg.batch_size, seed=8),
    classes=list(range(10)), name="resnet_exp1",
)
t0 = time.perf_counter()
ctrainer.train()
print(f"classifier trained in {time.perf_counter() - t0:.1f}s", flush=True)
print("checkpoints:", config.checkpoints, "and", clf_cfg.checkpoints, flush=True)
