"""Early stopping — host-side port of the reference utility
(``/root/reference/src/utils/early_stopping.py:9-88``): min/max-mode comparator with
``min_delta``, counter-based patience, ``early_stop`` flag, returns is-best for
checkpoint gating, plus ``reset()``."""
from __future__ import annotations


class EarlyStopping:
    def __init__(self, patience: int = 20, min_delta: float = 0.0,
                 mode: str = "min", verbose: bool = True):
        self.patience = patience
        self.min_delta = min_delta
        self.mode = mode
        self.verbose = verbose
        self.counter = 0
        self.best_score = None
        self.early_stop = False
        self.best_epoch = 0
        if mode == "min":
            self.is_better = lambda new, best: new < best - min_delta
        else:
            self.is_better = lambda new, best: new > best + min_delta

    def __call__(self, score: float, epoch: int) -> bool:
        """Returns True when `score` is a new best (save-checkpoint signal)."""
        is_best = False
        if self.best_score is None:
            self.best_score = score
            self.best_epoch = epoch
            is_best = True
            if self.verbose:
                print(f"EarlyStopping: initialized best score = {score:.6f}")
        elif self.is_better(score, self.best_score):
            if self.verbose:
                print(f"EarlyStopping: improved {self.best_score:.6f} -> {score:.6f}")
            self.best_score = score
            self.best_epoch = epoch
            self.counter = 0
            is_best = True
        else:
            self.counter += 1
            if self.verbose:
                print(f"EarlyStopping: no improvement (current: {score:.6f}, "
                      f"best: {self.best_score:.6f}), counter: "
                      f"{self.counter}/{self.patience}")
            if self.counter >= self.patience:
                self.early_stop = True
                if self.verbose:
                    print(f"EarlyStopping triggered: no improvement for "
                          f"{self.patience} epochs (best epoch {self.best_epoch}, "
                          f"best score {self.best_score:.6f})")
        return is_best

    def reset(self) -> None:
        self.counter = 0
        self.best_score = None
        self.early_stop = False
        self.best_epoch = 0

    # --- state for checkpoint/resume (superset of the reference) ---
    def state_dict(self) -> dict:
        return {"counter": self.counter, "best_score": self.best_score,
                "early_stop": self.early_stop, "best_epoch": self.best_epoch}

    def load_state_dict(self, state: dict) -> None:
        self.counter = state["counter"]
        self.best_score = state["best_score"]
        self.early_stop = state["early_stop"]
        self.best_epoch = state["best_epoch"]
