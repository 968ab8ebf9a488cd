"""Run-artifact writing helpers shared by both trainers.

Two concerns the naive per-trainer json.dump had:

- multi-host: every process would append/overwrite the same shared-filesystem
  files; only process 0 should own run artifacts (metrics are replicated).
- strict JSON: histories can contain NaN (padded val epochs) or inf; Python's
  json emits bare ``NaN``/``Infinity`` tokens that break non-Python tooling
  (jq, JS). Non-finite floats are serialized as null here. (Checkpoint
  host_state.json is a Python-internal format and keeps exact values.)
"""
from __future__ import annotations

import json
import math
import os
from typing import Any, Dict


def is_primary_host() -> bool:
    import jax
    return jax.process_count() == 1 or jax.process_index() == 0


def sanitize_json(obj: Any) -> Any:
    """Recursively replace non-finite floats with None (strict-JSON safe)."""
    if isinstance(obj, float):
        return obj if math.isfinite(obj) else None
    if isinstance(obj, dict):
        return {k: sanitize_json(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [sanitize_json(v) for v in obj]
    return obj


def append_metrics_line(output_dir: str, record: Dict[str, Any]) -> None:
    """Append one strict-JSON line to <output_dir>/metrics.jsonl (process 0)."""
    if not is_primary_host():
        return
    with open(os.path.join(output_dir, "metrics.jsonl"), "a") as f:
        f.write(json.dumps(sanitize_json(record)) + "\n")


def dump_history(output_dir: str, history: Dict[str, Any]) -> None:
    """Write <output_dir>/history.json as strict JSON (process 0)."""
    if not is_primary_host():
        return
    with open(os.path.join(output_dir, "history.json"), "w") as f:
        json.dump(sanitize_json(history), f)
