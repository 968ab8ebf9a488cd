"""Checkpointing: best-model save AND restore via orbax, with ASYNC saves.

The reference only ever saves (``torch.save`` at ``/root/reference/src/training/
trainer.py:402-418``; zero ``torch.load`` calls exist — SURVEY.md §5), bundling epoch,
model/optimizer/scheduler state and history, and blocks the epoch loop while doing it.
We keep that bundle layout but (a) add the missing restore path and (b) make the save
asynchronous (SURVEY.md §5 names orbax async checkpointing as the restart-recovery
answer): device arrays are snapshotted and serialized on a background thread while the
next epoch trains; host-side scalars/dicts ride alongside as JSON.

Crash safety: a save writes into ``<path>.pending`` and is promoted to ``<path>``
only after the async serialization finishes (on the next save, an explicit
``wait()``, or interpreter exit) — a crash mid-save leaves the previous complete
checkpoint at ``<path>`` untouched. The promotion itself is two renames; a crash
between them strands the previous checkpoint at ``<path>.old``, from which
``recover_checkpoint_dir`` (called by ``restore_checkpoint`` and ``--resume``)
moves it back.

Note: ``host_state.json`` inside a checkpoint is a Python-internal format and
may contain bare ``NaN``/``Infinity`` tokens (exact round-trip matters for
resume); the externally-consumed run artifacts (``history.json``,
``metrics.jsonl``) are strict JSON (utils/metrics_log.py).
"""
from __future__ import annotations

import atexit
import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp


# pending dirs owned by live writers in THIS process: recover_checkpoint_dir
# must not promote them out from under the writer (the writer's own wait()
# will) — promotion recovery is for pendings stranded by a DEAD process
_LIVE_PENDING: set = set()


class CheckpointWriter:
    """Async checkpoint writer; one save in flight at a time per writer."""

    def __init__(self):
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        self._pending: Optional[Tuple[str, str]] = None  # (tmp_dir, final_dir)
        atexit.register(self.wait)

    def save(self, path: str, device_state: Any, host_state: Dict) -> None:
        """Start an async save of `device_state` + `host_state` to `path`.

        Returns as soon as the device arrays are snapshotted; serialization and
        the atomic promotion to `path` happen in the background / on the next
        checkpoint operation. Mirrors the reference's bundle (trainer.py:402-417)
        without its epoch-loop stall."""
        import jax
        path = os.path.abspath(path)
        self.wait()  # finalize any previous save first
        tmp = path + ".pending"
        first = jax.process_count() == 1 or jax.process_index() == 0
        if first:
            # process 0 owns host-side filesystem mutations (shared-FS safe);
            # host_state is identical on every host (replicated metrics)
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            os.makedirs(tmp, exist_ok=True)
            with open(os.path.join(tmp, "host_state.json"), "w") as f:
                json.dump(host_state, f)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("ckpt_tmp_ready")
        self._ckptr.save(os.path.join(tmp, "state"), device_state)
        self._pending = (tmp, path)
        _LIVE_PENDING.add(tmp)

    def wait(self) -> None:
        """Block until the in-flight save (if any) is finalized at its path."""
        if self._pending is None:
            return
        tmp, path = self._pending
        self._pending = None
        self._ckptr.wait_until_finished()
        import jax
        multihost = jax.process_count() > 1
        if multihost:
            # all hosts reach here with their shards flushed before any
            # filesystem promotion happens
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("ckpt_promote_pre")
        if not multihost or jax.process_index() == 0:
            # promote: rename old aside, move pending in, drop old. The
            # non-atomic window is two renames — the previous checkpoint is
            # never deleted before the new one is complete on disk. On a
            # multi-host shared filesystem only process 0 touches the paths.
            old = path + ".old"
            if os.path.exists(old):
                shutil.rmtree(old)
            if os.path.exists(path):
                os.replace(path, old)
            try:
                os.replace(tmp, path)
            except FileNotFoundError:
                # tmp vanished under us (e.g. another process was pointed at
                # the same output dir). Checkpointing must never kill a
                # training run: roll the previous checkpoint back and warn.
                if os.path.exists(old) and not os.path.exists(path):
                    os.replace(old, path)
                print(f"WARNING: checkpoint promotion of {path} skipped — "
                      f"pending dir disappeared (concurrent writer?)")
            if os.path.exists(old):
                shutil.rmtree(old)
        if multihost:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("ckpt_promote_post")
        _LIVE_PENDING.discard(tmp)

    def close(self) -> None:
        self.wait()
        self._ckptr.close()


def save_checkpoint(path: str, device_state: Any, host_state: Dict) -> None:
    """Synchronous convenience save (used by tests/tools): async write + wait."""
    w = CheckpointWriter()
    w.save(path, device_state, host_state)
    w.close()


def recover_checkpoint_dir(path: str) -> bool:
    """Recover checkpoints stranded by a crash. Two cases, newest first:

    1. ``path.pending`` holds a COMPLETE serialized checkpoint (orbax commits
       the ``state`` dir by an atomic rename from ``state.orbax-checkpoint-tmp``,
       so ``state`` existing proves serialization finished) — the process was
       hard-killed between background serialization and the deferred promotion
       (which normally runs on the next save or at interpreter exit). Promote
       it now: it is strictly newer than whatever sits at ``path``.
    2. ``path`` missing but ``path.old`` present — crash between the two
       promotion renames; move the previous complete checkpoint back.

    Returns True iff a checkpoint exists at `path` afterwards.

    Multi-host: only process 0 touches the filesystem; everyone else waits."""
    import jax
    path = os.path.abspath(path)
    multihost = jax.process_count() > 1
    if not multihost or jax.process_index() == 0:
        old = path + ".old"
        pending = path + ".pending"
        if pending in _LIVE_PENDING:
            # a live CheckpointWriter in THIS process owns the pending save;
            # its own wait() will promote it — promoting here would race the
            # writer into its missing-pending fallback
            pass
        elif (os.path.isdir(os.path.join(pending, "state"))
                and os.path.isfile(os.path.join(pending, "host_state.json"))):
            if os.path.isdir(path):
                shutil.rmtree(path)
            os.replace(pending, path)
            print(f"Recovered checkpoint {path} from completed-but-unpromoted "
                  f"save ({pending})")
        elif not os.path.isdir(path) and os.path.isdir(old):
            os.replace(old, path)
            print(f"Recovered checkpoint {path} from interrupted promotion "
                  f"({old})")
    if multihost:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("ckpt_recover")
    return os.path.isdir(path)


def _default_device_target(ckptr, state_path: str):
    """Build a restore target from checkpoint METADATA, every leaf mapped onto
    the current default device — the ``torch.load(map_location=...)`` analog
    for orbax, which otherwise replays the *saved* sharding and fails when the
    checkpoint was written on a device type absent here (a TPU-trained
    checkpoint restored for CPU predict/eval, or vice versa)."""
    import jax
    meta = ckptr.metadata(state_path).item_metadata
    sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
    return jax.tree.map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
        meta)


def restore_checkpoint(path: str, target: Optional[Any] = None
                       ) -> Tuple[Any, Dict]:
    """Restore (device_state, host_state). `target` (a matching pytree of arrays)
    restores dtypes/shardings exactly; without it orbax first tries the saved
    topology, then falls back to the current default device when the saved
    sharding names devices that do not exist in this process (cross-platform
    restore — the reference loads any ``torch.save`` anywhere via
    ``map_location``; this keeps that property). Multi-host resume always
    passes ``target`` (the trainers do), so the single-device fallback only
    serves the predict/eval/export paths.

    Safe against live in-process writers: a pending save still owned by a
    CheckpointWriter in this process is left for that writer's own ``wait()``
    to promote (its contents would be mid-flight); callers restoring a path
    they are also saving should still ``wait()`` first to see the NEWEST
    state rather than the previously promoted one (the trainers do)."""
    path = os.path.abspath(path)
    recover_checkpoint_dir(path)
    ckptr = ocp.StandardCheckpointer()
    state_path = os.path.join(path, "state")
    if target is not None:
        device_state = ckptr.restore(state_path, target)
    else:
        try:
            device_state = ckptr.restore(state_path)
        except ValueError as e:
            # only the cross-platform case — any other ValueError (corrupt
            # tree, structural mismatch) should surface as itself
            if "was not found in jax.local_devices" not in str(e):
                raise
            device_state = ckptr.restore(
                state_path, _default_device_target(ckptr, state_path))
    with open(os.path.join(path, "host_state.json")) as f:
        host_state = json.load(f)
    return device_state, host_state
