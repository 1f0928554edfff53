#!/usr/bin/env python
"""Distill a trained DDPM into a 1-4-step consistency student.

Capability-plus over the reference (T-step ancestral sampling only): after
distillation, sampling is 1-4 single-batch forwards with guidance already
baked in — no CFG pass (see ldm_tpu/diffusion/consistency.py).

Usage:
  python scripts/distill_consistency.py configs/protocol_hard.yaml \
      [--teacher-checkpoint runs/.../diffusion_model_ema.msgpack] \
      [--epochs 24] [--skip 20] [--ema-decay 0.99] [--sample-steps 2]

Defaults are the measured-best recipe from the flagship-scale sweep
(perf/probe36.json `best24`: 24 epochs / target-EMA 0.99 / skip 20 /
lr 2e-4 — best classifier-FID at both 2 and 4 sampling steps, better
than the teacher's DDIM-50 anchor on both quality axes).

Writes consistency_model{,_ema}.msgpack next to the teacher's checkpoints
and a per-class sample grid under the run's results dir.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    from ldm_tpu.utils.cli import add_runtime_args, runtime_setup

    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--teacher-checkpoint", default=None,
                    help="teacher eps-model params "
                         "(default: run dir's diffusion_model_ema.msgpack)")
    ap.add_argument("--epochs", type=int, default=24,
                    help="distillation epochs (probe36 best24 recipe; "
                         "pass 0 to use config.epochs)")
    ap.add_argument("--skip", type=int, default=20,
                    help="boundary spacing k along the teacher ODE "
                         "(finer skip measured strictly worse — probe36)")
    ap.add_argument("--ema-decay", type=float, default=0.99,
                    help="target-network EMA (probe36 best24 recipe; the "
                         "CM-paper small-data value is 0.95)")
    ap.add_argument("--cfg-scale", type=float, default=None,
                    help="guidance strength distilled in (default: config's)")
    ap.add_argument("--lr", type=float, default=2e-4,
                    help="distill lr (probe36 best24 recipe; pass 0 to use "
                         "config.lr)")
    ap.add_argument("--huber-c", type=float, default=0.03)
    ap.add_argument("--sample-steps", type=int, default=2,
                    help="consistency steps for the final sample grid")
    add_runtime_args(ap)
    args = ap.parse_args()

    import jax
    import numpy as np

    from ldm_tpu.config import load_config
    from ldm_tpu.data.loader import create_dataloaders
    from ldm_tpu.factory import build_diffusion, build_model
    from ldm_tpu.training import checkpoint as ckpt
    from ldm_tpu.training.consistency_trainer import ConsistencyDistillTrainer
    from ldm_tpu.utils.images import image_grid, save_images
    from ldm_tpu.utils.seed import apply_runtime_flags, set_seed

    config = load_config(args.config)
    mesh, logger = runtime_setup(args, config)
    assert mesh is None, "distillation runs single-replica for now"
    set_seed(config.seed)
    apply_runtime_flags(config)
    train_loader, _val, _test, classes = create_dataloaders(
        config, allow_synthetic_fallback=not args.strict_data
    )

    model = build_model(config)
    diffusion = build_diffusion(config)
    teacher_path = args.teacher_checkpoint or os.path.join(
        config.checkpoints, "diffusion_model_ema.msgpack"
    )
    import jax.numpy as jnp

    d = config.data
    template = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((1, d.image_size, d.image_size, d.image_channels)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )
    teacher = ckpt.load_params(teacher_path, template)
    print(f"teacher: {teacher_path}", flush=True)

    trainer = ConsistencyDistillTrainer(
        config, model, diffusion, teacher, train_loader, classes,
        logger=logger, skip_steps=args.skip, cfg_scale=args.cfg_scale,
        ema_decay=args.ema_decay, huber_c=args.huber_c,
        lr=args.lr or None,  # 0 -> config.lr
    )
    result = trainer.train(args.epochs or None)  # 0 -> config.epochs
    print(f"final distill loss: {result['loss']:.5f}", flush=True)

    # per-class sample grid from the EMA student
    per_class = 8
    ids = np.repeat(np.arange(len(classes), dtype=np.int32), per_class)
    x0 = np.asarray(trainer.sample(jax.random.key(config.seed + 11), ids,
                                   n_sample_steps=args.sample_steps))
    imgs = ((np.clip(x0, -1, 1) + 1) / 2 * 255).astype(np.uint8)
    out = os.path.join(config.results,
                       f"consistency_{args.sample_steps}step_grid.png")
    save_images([image_grid(imgs, cols=per_class)], [out])
    print(f"sample grid: {out}", flush=True)


if __name__ == "__main__":
    main()
