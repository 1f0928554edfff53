"""Early stopping on validation loss (reference src/EarlyStopping.py:1-63).

Same semantics by default: score = -val_loss, improvement must exceed ``delta``,
patience counter, and the best state is checkpointed on every improvement.  The
reference saves weights-only via ``torch.save(model.state_dict())``
(src/EarlyStopping.py:56-63); here the save hook receives the full TrainState so
resume restores params + opt state + EMA + step (SURVEY.md §5, checkpoint/resume
row).

``min_delta_rel`` (config-gated, default 0 = exact reference parity) is a
TPU-first deviation (PARITY.md): with ``delta=0`` the reference counts ANY
non-increase as improvement — including exact ties — so a classifier whose val
loss saturates (1e-7-scale, or literally 0.0 on separable data) trains the full
epoch budget and never stops (the round-2 protocol wasted ~17 min this way,
VERDICT round 2 weak #2).  When set, an improvement must STRICTLY exceed
``delta + min_delta_rel * |best_val_loss|``: ties and relative-noise-scale
shrinkage then consume patience.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


class EarlyStopping:
    def __init__(
        self,
        patience: int = 7,
        verbose: bool = False,
        delta: float = 0.0,
        save_fn: Optional[Callable[[object], None]] = None,
        min_delta_rel: float = 0.0,
    ):
        self.patience = patience
        self.verbose = verbose
        self.delta = delta
        self.min_delta_rel = min_delta_rel
        self.save_fn = save_fn
        self.counter = 0
        self.best_score: Optional[float] = None
        self.early_stop = False
        self.val_loss_min = np.inf

    def _improved(self, val_loss: float) -> bool:
        if self.min_delta_rel > 0.0:
            required = self.delta + self.min_delta_rel * abs(self.val_loss_min)
            return (self.val_loss_min - val_loss) > required  # strict
        # reference semantics (src/EarlyStopping.py:35-54): ties improve
        return not (-val_loss < self.best_score + self.delta)

    def __call__(self, val_loss: float, state) -> None:
        if not np.isfinite(val_loss):
            # NaN/inf never counts as an improvement (NaN comparisons are always
            # False, which would otherwise save a broken checkpoint)
            self.counter += 1
            if self.counter >= self.patience:
                self.early_stop = True
            return
        val_loss = float(val_loss)
        if self.best_score is None:
            self.best_score = -val_loss
            self._save(val_loss, state)
        elif not self._improved(val_loss):
            self.counter += 1
            if self.verbose:
                print(f"EarlyStopping counter: {self.counter} out of {self.patience}")
            if self.counter >= self.patience:
                self.early_stop = True
        else:
            self.best_score = -val_loss
            self._save(val_loss, state)
            self.counter = 0

    def _save(self, val_loss: float, state) -> None:
        if self.verbose:
            print(
                f"Validation loss decreased ({self.val_loss_min:.6f} --> "
                f"{float(val_loss):.6f}). Saving model ..."
            )
        self.val_loss_min = float(val_loss)
        if self.save_fn is not None:
            self.save_fn(state)
