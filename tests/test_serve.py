"""AOT serving-export tests: jax.export artifacts round-trip through bytes,
serve any batch size, and match in-process inference exactly.

The reference has no deployment surface at all (SURVEY.md §0: zero torch.load
calls); serve.py is the production path beyond predict.load_predictor."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from pl_convlstm_gan_tpu.config import load_config
from pl_convlstm_gan_tpu.models import ConvLSTMForecaster
from pl_convlstm_gan_tpu.predict import build_model, load_predictor
from pl_convlstm_gan_tpu.serve import export_model, load_exported
from pl_convlstm_gan_tpu.train.checkpoint import save_checkpoint


def _forecaster_ckpt(tmp_path, config):
    model = build_model(config)
    rng = np.random.default_rng(0)
    sample = jnp.asarray(rng.random(
        (2, config.model.input_frames, 1, 16, 16)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), sample)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, {"params": params}, {"epoch": 0, "rmse": 1.0})
    return model, params, sample, path


def test_export_roundtrip_matches_inprocess(tmp_path):
    """serialize -> bytes -> deserialize -> call == model.apply exactly, and
    the artifact is batch-polymorphic (one export, any request batch)."""
    config = load_config("ci_smoke_seq")
    model, params, sample, ckpt = _forecaster_ckpt(tmp_path, config)

    blob = export_model(config, ckpt, (sample[:1],))
    assert isinstance(blob, bytes) and len(blob) > 0

    serve = load_exported(blob)
    ref = model.apply(params, sample)
    np.testing.assert_allclose(np.asarray(serve(sample)), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # different batch size, same artifact — no re-export needed
    big = jnp.concatenate([sample] * 3, axis=0)[:5]
    out5 = serve(big)
    assert out5.shape == (5, config.model.output_frames, 1, 16, 16)
    np.testing.assert_allclose(np.asarray(out5[:2]), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_export_artifact_batch_sharded_call(tmp_path):
    """A symbolic-batch artifact serves a batch SHARDED over the device mesh
    (throughput serving on a multi-chip host): the exported program has no
    pinned input shardings, so GSPMD splits the embarrassingly-parallel batch
    dim — output stays sharded and equals the replicated call exactly."""
    from jax.sharding import NamedSharding, PartitionSpec

    from pl_convlstm_gan_tpu.parallel import make_mesh

    config = load_config("ci_smoke_seq")
    model, params, sample, ckpt = _forecaster_ckpt(tmp_path, config)
    blob = export_model(config, ckpt, (sample[:1],))
    serve = load_exported(blob)

    big = jnp.concatenate([sample] * 4, axis=0)          # batch 8
    ref = serve(big)
    mesh = make_mesh()
    sharded = jax.device_put(big, NamedSharding(mesh, PartitionSpec("data")))
    out = serve(sharded)
    assert len(out.sharding.device_set) == jax.device_count() == 8
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_export_artifact_is_self_contained(tmp_path):
    """Serving needs only the bytes: write to disk, read back in a state where
    neither the checkpoint nor the config is consulted."""
    config = load_config("ci_smoke_seq")
    _, params, sample, ckpt = _forecaster_ckpt(tmp_path, config)
    blob = export_model(config, ckpt, (sample[:1],))
    art = tmp_path / "model.jaxexport"
    art.write_bytes(blob)

    import shutil
    shutil.rmtree(ckpt)  # checkpoint gone: the artifact must not need it
    serve = load_exported(art.read_bytes())
    out = serve(sample)
    assert out.shape == (2, config.model.output_frames, 1, 16, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_export_generator_family(tmp_path):
    """Generator export: 3-arg predict (rain/dem/lu), matches load_predictor."""
    config = load_config("ci_smoke")
    lu_ch = 5
    model = build_model(config, lu_channels=lu_ch)
    rng = np.random.default_rng(1)
    rain = jnp.asarray(rng.random((2, 3, 1, 8, 8)).astype(np.float32))
    dem = jnp.asarray(rng.random((2, 1, 8, 8)).astype(np.float32))
    lu = jnp.asarray(rng.random((2, lu_ch, 8, 8)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), rain, dem, lu)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, {"params": params}, {"epoch": 0, "rmse": 1.0})

    blob = export_model(config, ckpt, (rain[:1], dem[:1], lu[:1]),
                        lu_channels=lu_ch)
    serve = load_exported(blob)
    ref = load_predictor(config, ckpt, lu_channels=lu_ch)(rain, dem, lu)
    np.testing.assert_allclose(np.asarray(serve(rain, dem, lu)),
                               np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_export_static_batch(tmp_path):
    """batch_polymorphic=False pins the batch dim (smaller search space for
    XLA; the shape mismatch must fail loudly, not silently recompile)."""
    import pytest
    config = load_config("ci_smoke_seq")
    _, params, sample, ckpt = _forecaster_ckpt(tmp_path, config)
    blob = export_model(config, ckpt, (sample,), batch_polymorphic=False)
    serve = load_exported(blob)
    assert serve(sample).shape[0] == 2
    with pytest.raises(Exception):
        jax.block_until_ready(serve(jnp.concatenate([sample] * 2, axis=0)))


def test_streaming_export_roundtrip(tmp_path):
    """export_streaming -> bytes -> StreamingServer reproduces the in-process
    StreamingForecaster (observe chain + branched forecast), and the batch
    dim is symbolic (one artifact, any number of concurrent streams)."""
    from pl_convlstm_gan_tpu.serve import (export_streaming,
                                           load_streaming_exported)
    from pl_convlstm_gan_tpu.streaming import StreamingForecaster

    config = load_config("ci_smoke_seq")
    _, params, sample, ckpt = _forecaster_ckpt(tmp_path, config)

    blob = export_streaming(config, ckpt, 16, 16, horizons=(2, 3))
    art = tmp_path / "stream.jaxexport"
    art.write_bytes(blob)

    import shutil
    shutil.rmtree(ckpt)  # artifact must be self-contained
    server = load_streaming_exported(art.read_bytes())
    assert server.horizons == (2, 3)

    sf = StreamingForecaster(config, {"params": params["params"]})
    ref_state = sf.init_state(2, 16, 16)
    state = server.init_state(2)
    first_now = None
    for t in range(sample.shape[1]):
        ref_state, ref_now = sf.observe(ref_state, sample[:, t])
        state, now = server.observe(state, sample[:, t])
        first_now = now if first_now is None else first_now
        np.testing.assert_allclose(np.asarray(now), np.asarray(ref_now),
                                   rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(server.forecast(state, 3)),
                               np.asarray(sf.forecast(ref_state, 3)),
                               rtol=1e-5, atol=1e-5)

    # unexported horizon fails loudly
    import pytest
    with pytest.raises(ValueError, match="not in exported set"):
        server.forecast(state, 7)

    # symbolic batch: 5 concurrent streams through the same artifact
    s5 = server.init_state(5)
    frame5 = jnp.concatenate([sample[:, 0]] * 3, axis=0)[:5]
    s5, now5 = server.observe(s5, frame5)
    assert now5.shape == (5, 1, 16, 16)
    np.testing.assert_allclose(np.asarray(now5[:2]),
                               np.asarray(first_now), rtol=1e-5, atol=1e-5)


def test_streaming_export_pallas_entries(tmp_path):
    """tpu_kernel='require': the artifact carries TPU-only Pallas-kernel
    forecast programs (Mosaic custom calls, interpret forced off so a CPU
    export host still captures the compiled kernel) alongside the portable
    XLA programs; on a CPU backend the server must fall back to XLA."""
    import pytest
    from pl_convlstm_gan_tpu.serve import (export_streaming,
                                           load_streaming_exported)

    config = load_config("ci_smoke_seq")
    config.model.hidden_dims = [64, 64]   # kernel needs 2*ch % 128 == 0
    model = build_model(config)
    rng = np.random.default_rng(0)
    sample = jnp.asarray(rng.random(
        (1, config.model.input_frames, 1, 8, 8)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), sample)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, {"params": params}, {"epoch": 0, "rmse": 1.0})

    blob = export_streaming(config, ckpt, 8, 8, horizons=(2, 3),
                            tpu_kernel="require")
    server = load_streaming_exported(blob)
    assert server._meta["pallas_horizons"] == [2, 3]
    assert sorted(server._pallas_forecasts) == [2, 3]
    assert server.horizons == (2, 3)      # XLA programs still present

    state = server.init_state(1)
    state, _ = server.observe(state, sample[:, 0])
    fc = server.forecast(state, 2)        # CPU backend -> XLA fallback
    assert fc.shape == (1, 2, 1, 8, 8)
    assert np.isfinite(np.asarray(fc)).all()

    # 'require' fails loudly when no horizon fits the kernel's shape family
    cfg_small = load_config("ci_smoke_seq")   # hidden (8, 8): 16 lanes
    _, _, _, ckpt_small = _forecaster_ckpt(tmp_path / "small", cfg_small)
    with pytest.raises(ValueError, match="tpu_kernel"):
        export_streaming(cfg_small, ckpt_small, 16, 16, horizons=(2,),
                         tpu_kernel="require")

    # 'off' exports no kernel programs even at a supported shape
    blob_off = export_streaming(config, ckpt, 8, 8, horizons=(2,),
                                tpu_kernel="off")
    off_server = load_streaming_exported(blob_off)
    assert off_server._meta["pallas_horizons"] == []
    assert not off_server._pallas_forecasts


def test_streaming_artifact_format_versioning(tmp_path):
    """Artifacts with kernel programs mark format 2; XLA-only stay format 1;
    a future format fails loudly; unknown optional entry kinds are skipped."""
    import json
    import struct

    import pytest
    from pl_convlstm_gan_tpu.serve import (_STREAM_MAGIC, export_streaming,
                                           load_streaming_exported,
                                           parse_stream_header)

    config = load_config("ci_smoke_seq")
    _, _, _, ckpt = _forecaster_ckpt(tmp_path, config)
    blob = export_streaming(config, ckpt, 16, 16, horizons=(2,))
    meta, _ = parse_stream_header(blob)
    assert meta["format"] == 1            # no kernel entries -> format 1

    # a newer format must be rejected, not mis-parsed
    meta2 = dict(meta, format=99)
    hdr = json.dumps(meta2).encode()
    forged = (_STREAM_MAGIC + struct.pack("<I", len(hdr)) + hdr
              + blob[len(_STREAM_MAGIC) + 4 + len(
                  json.dumps(meta).encode()):])
    with pytest.raises(ValueError, match="newer"):
        load_streaming_exported(forged)

    # an unknown optional per-horizon entry kind is ignored, not fatal:
    # rename the forecast_2 entry to forecast_2_futurekind in the header
    # and keep its payload — the loader must skip it and still serve observe
    entries = [[n if n != "forecast_2" else "forecast_2_futurekind", ln]
               for n, ln in meta["entries"]]
    meta3 = dict(meta, entries=entries)
    hdr3 = json.dumps(meta3).encode()
    payload = blob[len(_STREAM_MAGIC) + 4 + len(json.dumps(meta).encode()):]
    forged3 = _STREAM_MAGIC + struct.pack("<I", len(hdr3)) + hdr3 + payload
    server = load_streaming_exported(forged3)
    assert server.horizons == ()          # the only forecast got skipped
    state = server.init_state(1)
    state, now = server.observe(
        state, np.zeros((1, 1, 16, 16), np.float32))
    assert now.shape == (1, 1, 16, 16)


def test_streaming_server_kernel_runtime_fallback(monkeypatch):
    """A kernel program that raises at runtime must not take down serving:
    the server warns, drops it, and the portable XLA program answers — this
    call and every later one (the broken program is forgotten)."""
    import warnings

    from pl_convlstm_gan_tpu.serve import StreamingServer

    calls = {"pallas": 0, "xla": 0}

    def bad_pallas(state):
        calls["pallas"] += 1
        raise RuntimeError("mosaic lowering rejected")

    def good_xla(state):
        calls["xla"] += 1
        return np.zeros((1, 2, 1, 8, 8), np.float32)

    meta = {"height": 8, "width": 8, "channels": 1, "hidden": [8, 8],
            "dtype": "float32", "pallas_batch": 1}
    server = StreamingServer(meta, lambda s, f: (s, f), {2: good_xla},
                             {2: bad_pallas})
    state = server.init_state(1)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = server.forecast(state, 2)
    assert out.shape == (1, 2, 1, 8, 8)
    assert calls == {"pallas": 1, "xla": 1}
    assert any("portable XLA program" in str(w.message) for w in caught)

    server.forecast(state, 2)            # broken program is not retried
    assert calls == {"pallas": 1, "xla": 2}


def test_parse_stream_header_corrupt_blobs():
    """Truncated or header-corrupt artifacts raise the documented ValueError,
    never raw struct/json tracebacks (the CLI relies on this for clear
    errors on interrupted copies)."""
    import json
    import struct

    import pytest
    from pl_convlstm_gan_tpu.serve import _STREAM_MAGIC, parse_stream_header

    with pytest.raises(ValueError, match="not a streaming"):
        parse_stream_header(b"\x00" * 16)
    # cut before the header-length word
    with pytest.raises(ValueError, match="truncated"):
        parse_stream_header(_STREAM_MAGIC + b"\x01")
    # header length promises more bytes than the blob holds
    with pytest.raises(ValueError, match="truncated"):
        parse_stream_header(_STREAM_MAGIC + struct.pack("<I", 100) + b"{}")
    # header present but not valid JSON
    bad = b"not json at all!"
    with pytest.raises(ValueError, match="corrupt"):
        parse_stream_header(_STREAM_MAGIC + struct.pack("<I", len(bad)) + bad)
    # sanity: a well-formed header still parses
    hdr = json.dumps({"format": 1, "entries": []}).encode()
    meta, off = parse_stream_header(
        _STREAM_MAGIC + struct.pack("<I", len(hdr)) + hdr)
    assert meta["format"] == 1 and off == len(_STREAM_MAGIC) + 4 + len(hdr)


def test_streaming_server_kernel_transient_failure_kept(monkeypatch):
    """A kernel program that has already served successfully is NOT dropped
    on a later (transient) failure: that request falls back to the portable
    program, the next request uses the kernel again."""
    import warnings

    from pl_convlstm_gan_tpu.serve import StreamingServer

    calls = {"pallas": 0, "xla": 0}
    fail_next = {"flag": False}

    def flaky_pallas(state):
        calls["pallas"] += 1
        if fail_next["flag"]:
            fail_next["flag"] = False
            raise RuntimeError("transient RESOURCE_EXHAUSTED")
        return np.ones((1, 2, 1, 8, 8), np.float32)

    def good_xla(state):
        calls["xla"] += 1
        return np.zeros((1, 2, 1, 8, 8), np.float32)

    meta = {"height": 8, "width": 8, "channels": 1, "hidden": [8, 8],
            "dtype": "float32", "pallas_batch": 1}
    server = StreamingServer(meta, lambda s, f: (s, f), {2: good_xla},
                             {2: flaky_pallas})
    state = server.init_state(1)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    assert float(server.forecast(state, 2)[0, 0, 0, 0, 0]) == 1.0   # proven
    fail_next["flag"] = True
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = server.forecast(state, 2)               # transient failure
    assert float(out[0, 0, 0, 0, 0]) == 0.0           # served by XLA
    assert any("for this request" in str(w.message) for w in caught)
    # kernel program retained -> next request uses it again
    assert float(server.forecast(state, 2)[0, 0, 0, 0, 0]) == 1.0
    assert calls == {"pallas": 3, "xla": 1}


def test_streaming_export_require_needs_tpu_platform(tmp_path):
    """tpu_kernel='require' without 'tpu' among the export platforms must
    raise, not silently produce a kernel-less artifact (the kernel block is
    gated on the platform list, so without this check the require contract
    would be skipped along with it)."""
    import pytest
    from pl_convlstm_gan_tpu.serve import export_streaming

    config = load_config("ci_smoke_seq")
    _, _, _, ckpt = _forecaster_ckpt(tmp_path, config)
    with pytest.raises(ValueError, match="require"):
        export_streaming(config, ckpt, 16, 16, horizons=(2,),
                         platforms=("cpu",), tpu_kernel="require")


def test_streaming_loader_lazy_and_bounds(tmp_path):
    """The loader parses entry names BEFORE deserializing payloads: an
    unknown entry kind with an unparseable payload is skipped untouched, a
    'forecast_<h>_pallas_<extra>' name is an unknown kind (not the pallas
    program), and a payload truncated mid-entry raises the documented
    ValueError instead of a raw deserializer traceback."""
    import json
    import struct

    import pytest
    from pl_convlstm_gan_tpu.serve import (_STREAM_MAGIC, export_streaming,
                                           load_streaming_exported,
                                           parse_stream_header)

    config = load_config("ci_smoke_seq")
    _, _, _, ckpt = _forecaster_ckpt(tmp_path, config)
    blob = export_streaming(config, ckpt, 16, 16, horizons=(2,))
    meta, payload_off = parse_stream_header(blob)
    payload = blob[payload_off:]

    def forge(new_meta, new_payload):
        hdr = json.dumps(new_meta).encode()
        return _STREAM_MAGIC + struct.pack("<I", len(hdr)) + hdr + new_payload

    # rename forecast_2 -> forecast_2_pallas_v2 AND garble its bytes: a
    # newer optional kind must be skipped without deserialization
    names = [n for n, _ in meta["entries"]]
    sizes = dict(meta["entries"])
    off = 0
    chunks = {}
    for n in names:
        chunks[n] = payload[off:off + sizes[n]]
        off += sizes[n]
    garbled = dict(chunks)
    garbled["forecast_2"] = b"\xde\xad" * (sizes["forecast_2"] // 2) + \
        b"\x00" * (sizes["forecast_2"] % 2)
    meta_v2 = dict(meta, entries=[
        [n if n != "forecast_2" else "forecast_2_pallas_v2", ln]
        for n, ln in meta["entries"]])
    server = load_streaming_exported(
        forge(meta_v2, b"".join(garbled[n] for n in names)))
    assert server.horizons == ()          # unknown kind skipped
    assert not server._pallas_forecasts   # NOT misread as the pallas program
    state = server.init_state(1)
    state, now = server.observe(state, np.zeros((1, 1, 16, 16), np.float32))
    assert now.shape == (1, 1, 16, 16)

    # payload cut mid-entry -> clean ValueError naming the entry
    with pytest.raises(ValueError, match="cut short"):
        load_streaming_exported(blob[:-10])

    # no observe entry -> clean ValueError
    meta_noobs = dict(meta, entries=[[n, ln] for n, ln in meta["entries"]
                                     if n != "observe"])
    payload_noobs = b"".join(chunks[n] for n in names if n != "observe")
    with pytest.raises(ValueError, match="no observe"):
        load_streaming_exported(forge(meta_noobs, payload_noobs))


def test_streaming_export_forces_portable_cell_impl(tmp_path):
    """An explicit ``model.convlstm_impl: pallas`` must not leak the per-step
    Pallas cell into the exported observe/forecast programs: its interpret
    decision is host-backend-dependent at trace time, so the artifact would
    either carry a TPU-only Mosaic call in its CPU lowering or bake the
    interpreter into the TPU one. The export override forces the portable
    XLA cell — every program in the artifact must carry the same StableHLO
    as one exported from an 'xla' config (serialized bytes can differ in
    metadata, so compare module text)."""
    import dataclasses

    from jax import export as jax_export

    from pl_convlstm_gan_tpu.serve import export_streaming, parse_stream_header

    import re

    def modules(blob):
        # strip #loc debug metadata: its numbering varies run-to-run while
        # the op structure (what a leaked pallas cell would change) does not
        canon = lambda txt: re.sub(r"\s*loc\(#?[^)]*\)", "",
                                   re.sub(r"#loc\d* = .*\n", "", txt))
        meta, off = parse_stream_header(blob)
        out = {}
        for name, length in meta["entries"]:
            out[name] = canon(jax_export.deserialize(
                blob[off:off + length]).mlir_module())
            off += length
        return out

    config = load_config("ci_smoke_seq")
    _, _, _, ckpt = _forecaster_ckpt(tmp_path, config)
    blob_xla = export_streaming(config, ckpt, 16, 16, horizons=(2,))
    cfg_pallas = dataclasses.replace(
        config, model=dataclasses.replace(config.model,
                                          convlstm_impl="pallas"))
    blob_pallas = export_streaming(cfg_pallas, ckpt, 16, 16, horizons=(2,))
    assert modules(blob_pallas) == modules(blob_xla)
