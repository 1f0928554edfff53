"""Shared CLI runtime flags for the entry points.

Every training script accepts the same runtime surface (reference scripts share
wandb/device setup the same way, e.g. train_diffusion_model.py:46-57):

``--cpu``          force the CPU platform (debug)
``--mesh``         data-parallel over all devices (single- or multi-host)
``--distributed``  initialize ``jax.distributed`` first (multi-host pods); implies
                   ``--mesh``
``--wandb``        mirror metrics/images to wandb (the reference's default sink,
                   main.py:93) — offline unless WANDB_MODE says otherwise
``--strict-data``  fail if the real dataset files are absent instead of falling
                   back to SYNTHETIC (the fallback is for the zero-egress dev
                   environment; a real-data run must never silently train on
                   synthetic data)
"""

from __future__ import annotations

import argparse


def add_runtime_args(ap: argparse.ArgumentParser) -> None:
    ap.add_argument("--cpu", action="store_true", help="force the CPU platform")
    ap.add_argument("--mesh", action="store_true",
                    help="data-parallel over all devices")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: jax.distributed.initialize (implies --mesh)")
    ap.add_argument("--wandb", action="store_true",
                    help="mirror metrics to wandb (offline by default)")
    ap.add_argument("--strict-data", action="store_true",
                    help="no synthetic fallback: fail if dataset files are absent")


def runtime_setup(args, config):
    """Apply the runtime flags; returns (mesh, logger).

    Order matters: the distributed runtime must initialize before the first
    device query, and the platform override before that.
    """
    import jax

    if getattr(args, "cpu", False):
        jax.config.update("jax_platforms", "cpu")
    if getattr(args, "distributed", False):
        from ldm_tpu.parallel.distributed import initialize

        if not initialize():
            raise RuntimeError(
                "--distributed needs LDM_TPU_DISTRIBUTED=1 (TPU pod autodetect) "
                "or LDM_TPU_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID"
            )
    mesh = None
    if getattr(args, "mesh", False) or getattr(args, "distributed", False):
        from ldm_tpu.parallel.mesh import create_mesh

        mesh = create_mesh()
    logger = None
    if getattr(args, "wandb", False):
        from ldm_tpu.utils.logging import MetricsLogger

        logger = MetricsLogger(
            config.dirpath, config.project_name, use_wandb=True
        )
    return mesh, logger
