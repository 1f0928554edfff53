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
        self._summary_rules: Dict[str, str] = {}
        self._summaries: Dict[str, float] = {}
        self._summary_path = (
            os.path.join(dirpath, "summary.json") if dirpath and primary else None
        )
        if use_wandb:
            try:
                import wandb  # noqa

                self._wandb = wandb
                if wandb.run is None:
                    wandb.init(project=project or "ldm_tpu", mode=os.environ.get("WANDB_MODE", "offline"))
            except ImportError:
                pass

    # ------------------------------------------------------------- summaries
    def define_summaries(self, rules: Dict[str, str]) -> None:
        """``wandb.define_metric(key, summary="min"/"max")`` parity (reference
        main.py:185-186, 232-235).  Forwarded to wandb when live, AND mirrored
        locally: the logger tracks the running min/max of each declared key and
        persists them to ``summary.json`` next to ``metrics.jsonl`` — so the
        run summary exists in the wandb-less environment too."""
        for key, mode in rules.items():
            if mode not in ("min", "max"):
                raise ValueError(f"summary mode must be min|max, got {mode!r}")
            self._summary_rules[key] = mode
        if self._wandb is not None and hasattr(self._wandb, "define_metric"):
            for key, mode in rules.items():
                self._wandb.define_metric(key, summary=mode)

    def _update_summaries(self, metrics: Dict[str, Any]) -> None:
        changed = False
        for key, mode in self._summary_rules.items():
            if key not in metrics:
                continue
            v = metrics[key]
            v = float(v) if hasattr(v, "item") or isinstance(v, (int, float)) else None
            if v is None:
                continue
            name = f"{key}.{mode}"
            cur = self._summaries.get(name)
            new = v if cur is None else (min(cur, v) if mode == "min" else max(cur, v))
            if new != cur:
                self._summaries[name] = new
                changed = True
        if changed and self._summary_path:
            with open(self._summary_path, "w") as f:
                json.dump(self._summaries, f, indent=2, sort_keys=True)

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
        if self._summary_rules and self._primary:
            self._update_summaries(metrics)
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

    def log_histograms(self, tag: str, tree, step: int) -> None:
        """Optional per-tensor watch (``wandb.watch(log="all")``, reference
        main.py:184, 232): one device→host transfer of the whole pytree, then
        per-leaf min/max/mean/std into the JSONL (and ``wandb.Histogram`` when
        live).  Heavier than ``log_norms`` — gate it with a cadence knob
        (``config.watch_histograms_every``)."""
        if not self._primary:
            return
        import jax
        import numpy as np

        leaves_p = jax.tree_util.tree_flatten_with_path(tree)[0]
        host = jax.device_get([leaf for _, leaf in leaves_p])
        rec = {}
        wandb_rec = {}
        for (path, _), a in zip(leaves_p, host):
            name = "/".join(
                str(getattr(k, "key", getattr(k, "idx", k))) for k in path
            )
            a = np.asarray(a, np.float32)
            rec[f"{tag}/{name}"] = [
                float(a.min()), float(a.max()), float(a.mean()), float(a.std())
            ]
            if self._wandb is not None and hasattr(self._wandb, "Histogram"):
                wandb_rec[f"{tag}/{name}"] = self._wandb.Histogram(a)
        if self._path:
            with open(self._path, "a") as f:
                f.write(json.dumps(
                    {"step": step, "ts": time.time(),
                     f"{tag}_histograms(min,max,mean,std)": rec}) + "\n")
        if wandb_rec:
            self._wandb.log(wandb_rec, step=step)

    def close(self) -> None:
        """Kept for API compatibility — writes are open-per-call, nothing to close."""
