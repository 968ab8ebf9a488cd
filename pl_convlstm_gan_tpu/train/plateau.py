"""ReduceLROnPlateau — host-side scheduler matching
``torch.optim.lr_scheduler.ReduceLROnPlateau`` semantics, which the reference uses with
mode='min' and config factor/patience (``/root/reference/src/training/trainer.py:
160-165``, stepped on val RMSE at trainer.py:368).

Torch defaults reproduced: threshold=1e-4 in 'rel' mode (improvement means
``new < best * (1 - threshold)`` for mode='min'), cooldown=0, min_lr=0. The LR lives on
the host and is fed into the jitted train step as a dynamic scalar each epoch, so LR
changes never trigger recompilation (SURVEY.md §7.3)."""
from __future__ import annotations


class ReduceLROnPlateau:
    def __init__(self, lr: float, mode: str = "min", factor: float = 0.1,
                 patience: int = 10, threshold: float = 1e-4,
                 threshold_mode: str = "rel", cooldown: int = 0,
                 min_lr: float = 0.0, verbose: bool = False):
        if factor >= 1.0:
            raise ValueError("Factor should be < 1.0")
        self.lr = float(lr)
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.cooldown = cooldown
        self.min_lr = min_lr
        self.verbose = verbose
        self.cooldown_counter = 0
        self.num_bad_epochs = 0
        self.best = float("inf") if mode == "min" else -float("inf")

    def _is_better(self, current: float) -> bool:
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return current < self.best * (1.0 - self.threshold)
            return current < self.best - self.threshold
        if self.threshold_mode == "rel":
            return current > self.best * (1.0 + self.threshold)
        return current > self.best + self.threshold

    def step(self, metric: float) -> float:
        """Feed the epoch metric; returns the (possibly reduced) current LR."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            new_lr = max(self.lr * self.factor, self.min_lr)
            if self.verbose and new_lr < self.lr:
                print(f"ReduceLROnPlateau: reducing lr {self.lr:.2e} -> {new_lr:.2e}")
            self.lr = new_lr
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.lr

    def state_dict(self) -> dict:
        return {k: v for k, v in self.__dict__.items()}

    def load_state_dict(self, state: dict) -> None:
        self.__dict__.update(state)
