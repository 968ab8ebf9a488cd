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
    # export carries only PORTABLE rollouts (the artifact must lower for
    # TPU+CPU StableHLO): the pallas kernel is a TPU-only Mosaic custom call,
    # so "pallas"/"auto" coerce to the XLA scan — but "int8"
    # (models/quantized.py) is plain StableHLO (s8 convs) and exports as-is,
    # weights quantized INTO the artifact
    impl = "int8" if config.model.rollout_impl == "int8" else "xla"
    fn = build_predict_fn(config, checkpoint_path, lu_channels, output_frames,
                          rollout_impl=impl)
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


# ---------------------------------------------------------------------------
# Streaming serving artifacts: the stateful online-inference surface
# (streaming.StreamingForecaster) as one self-contained multi-entry blob —
# an `observe` program (assimilate one frame) plus one `forecast` program per
# exported horizon, with the state geometry in a JSON header so the serving
# process can zero-init streams without model code.
# ---------------------------------------------------------------------------

_STREAM_MAGIC = b"PLCGSTR1"
# header format: 1 = observe + forecast_<h> entries; 2 adds OPTIONAL TPU-only
# forecast_<h>_pallas entries (readers must tolerate unknown-suffix entries)
_STREAM_FORMAT = 2


def export_streaming(config: Config, checkpoint_path: str, height: int,
                     width: int, horizons: Sequence[int] = (10,),
                     batch_polymorphic: bool = True, batch_size: int = 1,
                     platforms: Optional[Sequence[str]] = None,
                     tpu_kernel: str = "auto") -> bytes:
    """AOT-export the streaming inference surface for a checkpoint.

    The artifact contains `observe` (one-frame assimilation: ``(state,
    frame [B,C,H,W]) -> (state, nowcast)``) and a ``forecast`` program per
    horizon in `horizons` (``state -> [B, h, C, H, W]``; horizons are static
    loop lengths, so each needs its own lowering). H/W are static; the batch
    (number of concurrently-served streams) is symbolic unless
    `batch_polymorphic=False` pins it to `batch_size`.

    Forecast programs: every horizon gets a portable XLA-rollout program
    (TPU+CPU, symbolic batch). When ``tpu_kernel`` is ``"auto"`` (default)
    or ``"require"`` and ``"tpu"`` is among the platforms, each horizon the
    warm-start VMEM-resident Pallas kernel supports ADDITIONALLY gets a
    TPU-only program at the pinned ``batch_size`` (Mosaic custom calls need
    a static grid, so these can't be batch-polymorphic) — the server picks
    it on TPU when the request batch matches and falls back to the XLA
    program otherwise. ``"auto"`` embeds kernels only for on-device-validated
    cell counts; ``"require"`` opts into any supported family and raises if
    no horizon could get a kernel program; ``"off"`` skips them."""
    import json
    import struct

    from .streaming import StreamingForecaster

    horizons = [int(h) for h in horizons]
    if not horizons or any(h < 1 for h in horizons):
        raise ValueError(f"horizons must be >= 1, got {horizons}")
    if len(set(horizons)) != len(horizons):
        raise ValueError(f"duplicate horizons: {horizons}")
    if tpu_kernel not in ("auto", "require", "off"):
        raise ValueError(f"tpu_kernel must be auto/require/off, "
                         f"got {tpu_kernel!r}")
    plats = tuple(platforms or DEFAULT_PLATFORMS)
    if tpu_kernel == "require" and "tpu" not in plats:
        raise ValueError(
            f"tpu_kernel='require' but 'tpu' is not among the export "
            f"platforms {plats} — kernel programs are TPU-only Mosaic "
            f"custom calls")
    if config.model.convlstm_impl != "xla":
        # exported observe/forecast programs must stay portable across all
        # requested platforms: the per-step pallas cell's interpret decision
        # is host-backend-dependent at trace time, so an explicit
        # convlstm_impl 'pallas' would bake either a TPU-only Mosaic call
        # into the CPU lowering or the interpreter into the TPU one. The
        # kernel entries below use the warm-start ROLLOUT kernel and are
        # unaffected by this override.
        import dataclasses
        config = dataclasses.replace(
            config, model=dataclasses.replace(config.model,
                                              convlstm_impl="xla"))
    sf = StreamingForecaster.from_checkpoint(config, checkpoint_path)
    meta = sf.export_meta()
    state_tpl = jax.eval_shape(lambda: sf.init_state(batch_size, height,
                                                     width))
    if batch_polymorphic:
        (b,) = _jax_export.symbolic_shape("b")
    else:
        b = batch_size
    resize = lambda a: jax.ShapeDtypeStruct((b,) + a.shape[1:], a.dtype)
    state_spec = (tuple(tuple(resize(x) for x in pair)
                        for pair in state_tpl.cells),
                  resize(state_tpl.prev_out))
    frame_spec = jax.ShapeDtypeStruct((b, meta["channels"], height, width),
                                      np.float32)

    # rollout_impl 'int8' swaps the PORTABLE forecast programs for the
    # quantized decode (plain StableHLO — exports TPU+CPU, symbolic batch,
    # weights quantized into the blob); observe stays float by design
    quantized = config.model.rollout_impl == "int8"
    forecast_fn = (sf.export_forecast_int8_fn if quantized
                   else sf.export_forecast_fn)
    if quantized:
        meta["rollout"] = "int8"
        # kernel entries are bf16 Mosaic programs the server would prefer on
        # TPU — silently serving NON-quantized forecasts from an artifact the
        # user exported as int8. Skip them; 'require' is a contradiction.
        if tpu_kernel == "require":
            raise ValueError(
                "tpu_kernel='require' contradicts rollout_impl 'int8': the "
                "Pallas kernel programs are bf16 and would shadow the "
                "quantized forecast on TPU — export with tpu_kernel='off' "
                "(or a non-int8 config)")
        tpu_kernel = "off"
    entries = [("observe", _jax_export.export(
        jax.jit(sf.export_observe_fn()), platforms=plats)(
            state_spec, frame_spec).serialize())]
    for h in horizons:
        entries.append((f"forecast_{h}", _jax_export.export(
            jax.jit(forecast_fn(h)), platforms=plats)(
                state_spec).serialize()))

    # TPU-only Pallas-kernel forecast programs at the pinned batch size
    pallas_horizons = []
    if tpu_kernel != "off" and "tpu" in plats:
        static_spec = (tuple(tuple(pair) for pair in state_tpl.cells),
                       state_tpl.prev_out)
        for h in horizons:
            if not sf.pallas_forecast_fits(batch_size, height, width, h,
                                           auto=(tpu_kernel == "auto")):
                continue
            data = _jax_export.export(
                jax.jit(sf.export_forecast_pallas_fn(h)),
                platforms=["tpu"])(static_spec).serialize()
            entries.append((f"forecast_{h}_pallas", data))
            pallas_horizons.append(h)
        if tpu_kernel == "require" and not pallas_horizons:
            raise ValueError(
                "tpu_kernel='require' but the Pallas rollout kernel supports "
                "none of the requested horizons at this shape (needs 2-3 "
                "equal-width cells with 2*ch % 128 == 0, 3x3 kernels, "
                "1-channel frames, H/W % 8 == 0, VMEM budget)")

    header = json.dumps({
        "format": _STREAM_FORMAT if pallas_horizons else 1,
        "height": height, "width": width,
        "horizons": horizons,
        "pallas_horizons": pallas_horizons, "pallas_batch": batch_size,
        "batch_polymorphic": bool(batch_polymorphic),
        "entries": [[name, len(data)] for name, data in entries], **meta,
    }).encode()
    return b"".join([_STREAM_MAGIC, struct.pack("<I", len(header)), header]
                    + [bytes(data) for _, data in entries])


class StreamingServer:
    """Deserialized streaming artifact: zero-init streams, assimilate frames,
    branch forecasts — no model code, config, or checkpoint needed."""

    def __init__(self, meta: dict, observe_fn: Callable,
                 forecast_fns: dict, pallas_forecast_fns: Optional[dict] = None):
        self._meta = meta
        self._observe = observe_fn
        self._forecasts = forecast_fns
        self._pallas_forecasts = pallas_forecast_fns or {}
        self._pallas_proven = set()   # horizons whose kernel ran OK once
        # Serializes proven-set reads against drops: without it a first-use
        # failure racing a concurrent first-use success on the same horizon
        # could pop a kernel that just proved itself (silent permanent
        # degradation) or mark a dropped horizon proven.
        import threading
        self._pallas_lock = threading.Lock()

    @property
    def horizons(self) -> Tuple[int, ...]:
        return tuple(sorted(self._forecasts))

    def init_state(self, batch_size: int):
        """Fresh zero stream state for `batch_size` concurrent streams."""
        import jax.numpy as jnp
        m = self._meta
        dt = jnp.bfloat16 if m["dtype"] == "bfloat16" else jnp.float32
        z = lambda f: jnp.zeros((batch_size, m["height"], m["width"], f), dt)
        return (tuple((z(f), z(f)) for f in m["hidden"]), z(m["channels"]))

    def observe(self, state, frame):
        """Assimilate ``frame [B, C, H, W]`` -> ``(new_state, nowcast)``."""
        return self._observe(state, frame)

    def forecast(self, state, horizon: int):
        """Branch a ``horizon``-frame forecast (must be an exported one).

        On TPU, when the artifact carries a Pallas-kernel program for this
        horizon and the request batch matches its pinned batch size, that
        program serves the call; otherwise the portable XLA program does.
        A kernel program that fails on its FIRST use (e.g. a Mosaic compile
        error on an unvalidated family exported with ``tpu_kernel='require'``)
        is dropped with a warning and the portable program serves that horizon
        from then on. A program that has already served successfully is kept:
        a later failure (transient RESOURCE_EXHAUSTED under concurrent load,
        a preempted device) falls back for that request only — an embedded
        optimization must never take down OR permanently degrade serving.

        Kernel-served calls are blocked until the result is READY before
        returning: jit dispatch is asynchronous, so without the sync an
        execution-time failure would raise later at the consumer — outside
        this fallback — and a kernel would be marked proven by a dispatch
        that never actually ran. The sync costs nothing in practice: a
        serving caller fetches the result immediately anyway."""
        if horizon not in self._forecasts:
            raise ValueError(f"horizon {horizon} not in exported set "
                             f"{self.horizons}")
        pfn = self._pallas_forecasts.get(horizon)
        if (pfn is not None and jax.default_backend() == "tpu"
                and state[1].shape[0] == self._meta.get("pallas_batch")):
            try:
                out = jax.block_until_ready(pfn(state))
                with self._pallas_lock:
                    # only mark proven while the kernel entry still exists: a
                    # concurrent first-use failure may have dropped this
                    # horizon between our call and this lock, and a proven
                    # mark on a dropped horizon would falsify the invariant
                    # "_pallas_proven implies the kernel is present"
                    if horizon in self._pallas_forecasts:
                        self._pallas_proven.add(horizon)
                return out
            except Exception as e:  # fall back to the portable program
                import warnings
                # Decide and drop under one lock: the proven check must be
                # atomic with the pop, or a failure racing a concurrent
                # success on this horizon drops a kernel that just proved
                # itself / marks a dropped horizon proven.
                with self._pallas_lock:
                    if horizon in self._pallas_proven:
                        scope = "for this request"
                    else:
                        scope = "from now on"
                        # pop, not del: two threads hitting the same broken
                        # horizon must not raise KeyError inside the handler
                        self._pallas_forecasts.pop(horizon, None)
                warnings.warn(
                    f"embedded TPU kernel program for horizon {horizon} "
                    f"failed ({type(e).__name__}: {e}); serving the portable "
                    f"XLA program {scope}")
        return self._forecasts[horizon](state)


def parse_stream_header(blob: bytes) -> Tuple[dict, int]:
    """Validate magic/format and return ``(header_meta, payload_offset)``.

    The single owner of the artifact wire layout — the loader and any
    header-only consumer (e.g. the CLI's export summary) share it."""
    import json
    import struct

    if blob[:len(_STREAM_MAGIC)] != _STREAM_MAGIC:
        raise ValueError("not a streaming serving artifact")
    off = len(_STREAM_MAGIC)
    if len(blob) < off + 4:
        raise ValueError("truncated streaming artifact (no header length)")
    (hlen,) = struct.unpack("<I", blob[off:off + 4])
    off += 4
    raw = blob[off:off + hlen]
    if len(raw) < hlen:
        raise ValueError("truncated streaming artifact (header cut short)")
    try:
        meta = json.loads(raw.decode())
    except (UnicodeDecodeError, json.JSONDecodeError) as e:
        raise ValueError(f"corrupt streaming artifact header: {e}") from e
    fmt = meta.get("format", 1)
    if fmt > _STREAM_FORMAT:
        raise ValueError(f"streaming artifact format {fmt} is newer than "
                         f"this release supports ({_STREAM_FORMAT})")
    return meta, off + hlen


def load_streaming_exported(blob: bytes) -> StreamingServer:
    """Deserialize an ``export_streaming`` artifact.

    Entry names are parsed BEFORE any payload is deserialized: an unknown
    entry kind from a newer writer is skipped without touching its bytes, so
    the format's forward tolerance doesn't hinge on this jax release being
    able to parse programs it would never call."""
    meta, off = parse_stream_header(blob)
    raw = []
    for name, length in meta["entries"]:
        if off + length > len(blob):
            raise ValueError(f"truncated streaming artifact "
                             f"(entry {name!r} cut short)")
        raw.append((name, blob[off:off + length]))
        off += length
    load = lambda data: jax.jit(_jax_export.deserialize(data).call)
    observe, forecasts, pallas = None, {}, {}
    for n, data in raw:
        if n == "observe":
            observe = load(data)
            continue
        if not n.startswith("forecast_"):
            continue                 # unknown future entry kind: skip
        parts = n.split("_")
        if not parts[1].isdigit():   # unknown future entry kind: skip
            continue
        h = int(parts[1])
        if len(parts) == 2:
            forecasts[h] = load(data)
        elif len(parts) == 3 and parts[2] == "pallas":
            pallas[h] = load(data)
        # any other suffix: a newer optional program kind — ignore
    if observe is None:
        raise ValueError("streaming artifact has no observe entry")
    return StreamingServer(meta, observe, forecasts, pallas)
