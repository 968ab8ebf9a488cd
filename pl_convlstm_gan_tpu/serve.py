"""AOT model export for serving: portable ``jax.export`` (StableHLO) artifacts.

The reference repo has NO deployment path at all (zero ``torch.load`` calls,
SURVEY.md §0). ``predict.load_predictor`` gives in-process inference; this module
is the production-serving step beyond it: a trained checkpoint becomes a single
self-contained artifact that

- is **ahead-of-time lowered** — the serving process never traces Python or needs
  the model code, flax, or the config system; it deserializes and calls;
- is **batch-polymorphic** — exported with a symbolic batch dimension, one
  artifact serves any request batch size with no retrace (XLA compiles per
  concrete shape on first use, subsequent calls are cached);
- is **multi-platform** — lowered for TPU and CPU in one artifact, so the same
  bytes serve on a v5e slice and in a CPU canary;
- pins the jax/StableHLO serialization version it was built with (jax.export
  guarantees forward compatibility across jax releases for serialized modules).

Usage:
    from pl_convlstm_gan_tpu.serve import export_model, load_exported
    blob = export_model(config, "output/best_model", sample)   # bytes
    open("model.jaxexport", "wb").write(blob)
    ...
    serve = load_exported(open("model.jaxexport", "rb").read())
    pred = serve(frames)          # forecaster/gan: any batch size
    pred = serve(rain, dem, lu)   # generator family

CLI: ``python main.py --config <name> --mode export [--output model.jaxexport]``.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import numpy as np
from jax import export as _jax_export

from .config import Config
from .predict import build_predict_fn

# TPU first (the deployment target), CPU second (canaries / tests); the
# artifact carries lowerings for both.
DEFAULT_PLATFORMS: Tuple[str, ...] = ("tpu", "cpu")


def _example_specs(example_args, batch_polymorphic: bool):
    """ShapeDtypeStructs for export; dim 0 of every arg becomes one shared
    symbolic batch dimension when `batch_polymorphic`."""
    # np.asarray: only shape/dtype are needed — jnp would device-put the full
    # sample through the tunnel for nothing
    args = [np.asarray(a) for a in example_args]
    if not batch_polymorphic:
        return [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args]
    (b,) = _jax_export.symbolic_shape("b")
    return [jax.ShapeDtypeStruct((b,) + a.shape[1:], a.dtype) for a in args]


def export_model(config: Config, checkpoint_path: str, example_args: Sequence,
                 lu_channels: int = 0, output_frames: int = 0,
                 batch_polymorphic: bool = True,
                 platforms: Optional[Sequence[str]] = None) -> bytes:
    """Restore `checkpoint_path` and AOT-export the predict function.

    `example_args` fixes the non-batch shapes (T/H/W/channels are static —
    they determine the compiled program): forecaster/gan families take
    ``(frames,)``; the generator takes ``(rain_lr, dem, lu)``. Returns the
    serialized artifact bytes for ``load_exported``."""
    # export always uses the XLA rollout: the serving artifact must carry
    # portable TPU+CPU StableHLO lowerings, and the pallas rollout kernel is a
    # TPU-only Mosaic custom call
    fn = build_predict_fn(config, checkpoint_path, lu_channels, output_frames,
                          rollout_impl="xla")
    specs = _example_specs(example_args, batch_polymorphic)
    exported = _jax_export.export(
        jax.jit(fn), platforms=tuple(platforms or DEFAULT_PLATFORMS))(*specs)
    return bytes(exported.serialize())


def load_exported(blob: bytes) -> Callable:
    """Deserialize an ``export_model`` artifact into a callable.

    The call is jit-cached per concrete input shape; no model code, config, or
    checkpoint access happens at serving time."""
    exported = _jax_export.deserialize(blob)
    return jax.jit(exported.call)
