"""Checkpointing: best-model save AND restore via orbax.

The reference only ever saves (``torch.save`` at ``/root/reference/src/training/
trainer.py:402-418``; zero ``torch.load`` calls exist — SURVEY.md §5), bundling epoch,
model/optimizer/scheduler state and history. We keep that bundle layout but add the
missing restore path: device pytrees (params/opt_state) go through orbax; host-side
scalars/dicts (epoch, rmse, history, scheduler/early-stop state) ride alongside as
JSON."""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp


def save_checkpoint(path: str, device_state: Any, host_state: Dict) -> None:
    """Atomically replace the checkpoint at `path` (a directory).

    Mirrors the reference's delete-then-save of best_model.pth
    (trainer.py:402-417)."""
    path = os.path.abspath(path)
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(tmp, "state"), device_state)
    ckptr.wait_until_finished()
    with open(os.path.join(tmp, "host_state.json"), "w") as f:
        json.dump(host_state, f)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


def restore_checkpoint(path: str, target: Optional[Any] = None
                       ) -> Tuple[Any, Dict]:
    """Restore (device_state, host_state). `target` (a matching pytree of arrays)
    restores dtypes/shardings exactly; without it orbax infers the topology."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    state_path = os.path.join(path, "state")
    if target is not None:
        device_state = ckptr.restore(state_path, target)
    else:
        device_state = ckptr.restore(state_path)
    with open(os.path.join(path, "host_state.json")) as f:
        host_state = json.load(f)
    return device_state, host_state
