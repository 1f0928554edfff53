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


class MetricsLogger:
    def __init__(
        self,
        dirpath: Optional[str] = None,
        project: str = "",
        use_wandb: bool = False,
        quiet: bool = False,
    ):
        self.quiet = quiet
        self._file = None
        if dirpath:
            os.makedirs(dirpath, exist_ok=True)
            self._file = open(os.path.join(dirpath, "metrics.jsonl"), "a")
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
        if self._file:
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_images(self, images, step: int, mode: str, dirpath: Optional[str] = None):
        """Save an image grid to disk (and wandb if enabled) — the reference logs
        sample grids to wandb every 2 epochs (src/DiffusionModelTrainer.py:140-143)."""
        from ldm_tpu.utils.images import image_grid, save_images

        grid = image_grid(images)
        if dirpath:
            os.makedirs(dirpath, exist_ok=True)
            save_images([grid], [os.path.join(dirpath, f"{mode}_step{step}.png")])
        if self._wandb is not None:
            self._wandb.log({f"{mode}/images": [self._wandb.Image(grid)]}, step=step)

    def close(self) -> None:
        if self._file:
            self._file.close()
