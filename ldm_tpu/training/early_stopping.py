"""Early stopping on validation loss (reference src/EarlyStopping.py:1-63).

Same semantics: score = -val_loss, improvement must exceed ``delta``, patience
counter, and the best state is checkpointed on every improvement.  The reference
saves weights-only via ``torch.save(model.state_dict())`` (src/EarlyStopping.py:56-63);
here the save hook receives the full TrainState so resume restores params + opt
state + EMA + step (SURVEY.md §5, checkpoint/resume row).
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
    ):
        self.patience = patience
        self.verbose = verbose
        self.delta = delta
        self.save_fn = save_fn
        self.counter = 0
        self.best_score: Optional[float] = None
        self.early_stop = False
        self.val_loss_min = np.inf

    def __call__(self, val_loss: float, state) -> None:
        if not np.isfinite(val_loss):
            # NaN/inf never counts as an improvement (NaN comparisons are always
            # False, which would otherwise save a broken checkpoint)
            self.counter += 1
            if self.counter >= self.patience:
                self.early_stop = True
            return
        score = -float(val_loss)
        if self.best_score is None:
            self.best_score = score
            self._save(val_loss, state)
        elif score < self.best_score + self.delta:
            self.counter += 1
            if self.verbose:
                print(f"EarlyStopping counter: {self.counter} out of {self.patience}")
            if self.counter >= self.patience:
                self.early_stop = True
        else:
            self.best_score = score
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
