"""Metrics logging: stdout + JSONL, with optional wandb.

The reference is wandb-centric (wandb.init/watch/define_metric/log in every entry
point, e.g. main.py:93,184-186; helpers at src/Trainer.py:82-93) and defaults to
``WANDB_MODE=dryrun`` offline (main.py:32).  Here the primary sinks are stdout and an
append-only JSONL file per run (machine-readable, diffable); wandb is used when the
package is importable and enabled — a thin adapter, not a hard dependency.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


def _global_norm(tree):
    """One jitted dispatch for sqrt(sum of squared leaves) — per-leaf eager ops
    would pay the ~20 ms tunnel latency hundreds of times."""
    import jax

    global _global_norm_fn
    if _global_norm_fn is None:
        import jax.numpy as jnp
        import optax

        _global_norm_fn = jax.jit(
            lambda t: optax.global_norm(
                jax.tree.map(lambda x: x.astype(jnp.float32), t)
            )
        )
    return _global_norm_fn(tree)


_global_norm_fn = None


class MetricsLogger:
    def __init__(
        self,
        dirpath: Optional[str] = None,
        project: str = "",
        use_wandb: bool = False,
        quiet: bool = False,
    ):
        import jax

        # Multi-host: metrics are replicated — host-side sinks (stdout, file,
        # wandb) live on process 0 only; other processes log nothing.
        primary = jax.process_index() == 0
        self._primary = primary
        self.quiet = quiet or not primary
        # Open-per-write (the log cadence is once per epoch): no handle is ever
        # left dangling by trainers that don't own the logger's lifecycle.
        self._path = None
        if dirpath and primary:
            os.makedirs(dirpath, exist_ok=True)
            self._path = os.path.join(dirpath, "metrics.jsonl")
        use_wandb = use_wandb and primary
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # noqa

                self._wandb = wandb
                if wandb.run is None:
                    wandb.init(project=project or "ldm_tpu", mode=os.environ.get("WANDB_MODE", "offline"))
            except ImportError:
                pass

    def log(self, metrics: Dict[str, Any], step: int) -> None:
        rec = {"step": step, "ts": time.time()}
        rec.update({k: (float(v) if hasattr(v, "item") else v) for k, v in metrics.items()})
        if not self.quiet:
            msg = " ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in rec.items()
                if k != "ts"
            )
            print(msg, flush=True)
        if self._path:
            with open(self._path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(
                {k: (float(v) if hasattr(v, "item") else v)
                 for k, v in metrics.items()},
                step=step,
            )

    def log_images(self, images, step: int, mode: str, dirpath: Optional[str] = None):
        """Save an image grid to disk (and wandb if enabled) — the reference logs
        sample grids to wandb every 2 epochs (src/DiffusionModelTrainer.py:140-143)."""
        if not self._primary:
            return
        from ldm_tpu.utils.images import image_grid, save_images

        grid = image_grid(images)
        if dirpath:
            os.makedirs(dirpath, exist_ok=True)
            save_images([grid], [os.path.join(dirpath, f"{mode}_step{step}.png")])
        if self._wandb is not None:
            self._wandb.log({f"{mode}/images": [self._wandb.Image(grid)]}, step=step)

    def log_norms(self, tag: str, tree, step: int) -> None:
        """Per-epoch parameter/gradient global-norm logging — the stand-in for the
        reference's ``wandb.watch(model, log="all", log_freq=10)`` (main.py:184-186):
        one cheap jitted on-device reduction instead of per-tensor histograms."""
        norm = _global_norm(tree)
        self.log({f"{tag}_global_norm": float(norm)}, step=step)

    def close(self) -> None:
        """Kept for API compatibility — writes are open-per-call, nothing to close."""
