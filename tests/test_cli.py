"""CLI surface tests: main.py train + eval modes (reference main.py:11-24 parity
plus the eval extension), run in-process with patched argv."""
import os
import shutil
import sys

import pytest


def _run_main(argv, tmp_out):
    import main as main_mod
    # redirect the config's output dir into tmp via env-free monkeypatching:
    # ci_smoke writes to output/ci_smoke relative to cwd
    old_argv = sys.argv
    old_cwd = os.getcwd()
    try:
        os.chdir(tmp_out)
        sys.argv = ["main.py"] + argv
        main_mod.main()
    finally:
        sys.argv = old_argv
        os.chdir(old_cwd)


def test_cli_train_then_eval(tmp_path):
    _run_main(["--config", "ci_smoke"], str(tmp_path))
    out = tmp_path / "output" / "ci_smoke"
    assert (out / "best_model").is_dir()
    assert (out / "history.json").exists()
    # eval mode restores the checkpoint and prints test metrics
    _run_main(["--config", "ci_smoke", "--mode", "eval"], str(tmp_path))


def test_unknown_config_falls_back_to_default(monkeypatch):
    """Reference semantics (src/config.py:122-132): a missing config name falls
    back to $CONFIG_NAME, then 'default' — it does NOT raise."""
    monkeypatch.delenv("CONFIG_NAME", raising=False)
    from pl_convlstm_gan_tpu.config import load_config
    cfg = load_config("nope_does_not_exist")
    assert cfg.model.family == "generator"   # default.yaml loaded


def test_cli_predict_mode(tmp_path):
    """predict mode: restore a trained checkpoint and write predictions.npy
    for a raw input array (deployment entry the reference lacks)."""
    import numpy as np
    _run_main(["--config", "ci_smoke_seq"], str(tmp_path))
    frames = np.random.default_rng(0).random((2, 2, 1, 16, 16)).astype(np.float32)
    np.save(tmp_path / "in.npy", frames)
    _run_main(["--config", "ci_smoke_seq", "--mode", "predict",
               "--input", str(tmp_path / "in.npy"),
               "--output", str(tmp_path / "out.npy")], str(tmp_path))
    pred = np.load(tmp_path / "out.npy")
    assert pred.shape == (2, 3, 1, 16, 16)
    assert np.isfinite(pred).all()


def test_cli_predict_requires_input(tmp_path):
    with pytest.raises(SystemExit):
        _run_main(["--config", "ci_smoke_seq", "--mode", "predict"],
                  str(tmp_path))


def test_cli_predict_generator_npz(tmp_path):
    """Generator-family predict: .npz with rain_lr/dem/lu arrays."""
    import numpy as np
    _run_main(["--config", "ci_smoke"], str(tmp_path))
    rng = np.random.default_rng(0)
    np.savez(tmp_path / "in.npz",
             rain_lr=rng.random((1, 3, 1, 8, 8)).astype(np.float32),
             dem=rng.random((1, 1, 8, 8)).astype(np.float32),
             lu=rng.random((1, 5, 8, 8)).astype(np.float32))  # 5 synthetic LU classes
    _run_main(["--config", "ci_smoke", "--mode", "predict",
               "--input", str(tmp_path / "in.npz"),
               "--output", str(tmp_path / "out.npy")], str(tmp_path))
    pred = np.load(tmp_path / "out.npy")
    assert pred.shape == (1, 3, 1, 16, 16)


def test_cli_predict_forecaster_npz(tmp_path):
    """Forecaster-family predict dispatches on config.model.family, so an
    .npz frames file (the format NpyFramesDataset accepts for training) works
    too — it must NOT be routed to the generator branch by its extension."""
    import numpy as np
    _run_main(["--config", "ci_smoke_seq"], str(tmp_path))
    frames = np.random.default_rng(0).random((2, 2, 1, 16, 16)).astype(np.float32)
    np.savez(tmp_path / "in.npz", frames=frames)
    _run_main(["--config", "ci_smoke_seq", "--mode", "predict",
               "--input", str(tmp_path / "in.npz"),
               "--output", str(tmp_path / "out.npy")], str(tmp_path))
    pred = np.load(tmp_path / "out.npy")
    assert pred.shape == (2, 3, 1, 16, 16)
    assert np.isfinite(pred).all()


def test_cli_export_mode(tmp_path):
    """export mode: checkpoint -> self-contained AOT serving artifact."""
    import numpy as np
    from pl_convlstm_gan_tpu.serve import load_exported
    _run_main(["--config", "ci_smoke_seq"], str(tmp_path))
    art = tmp_path / "model.jaxexport"
    _run_main(["--config", "ci_smoke_seq", "--mode", "export",
               "--output", str(art)], str(tmp_path))
    serve = load_exported(art.read_bytes())
    frames = np.random.default_rng(0).random((3, 2, 1, 16, 16)).astype(np.float32)
    pred = serve(frames)
    assert pred.shape == (3, 3, 1, 16, 16)
    assert np.isfinite(np.asarray(pred)).all()


def test_cli_predict_output_frames_override(tmp_path):
    """--output-frames serves a longer horizon than the checkpoint was
    trained at (recurrent params are horizon-independent)."""
    import numpy as np
    _run_main(["--config", "ci_smoke_seq"], str(tmp_path))
    frames = np.random.default_rng(0).random((2, 2, 1, 16, 16)).astype(np.float32)
    np.save(tmp_path / "in.npy", frames)
    _run_main(["--config", "ci_smoke_seq", "--mode", "predict",
               "--output-frames", "7",
               "--input", str(tmp_path / "in.npy"),
               "--output", str(tmp_path / "out.npy")], str(tmp_path))
    pred = np.load(tmp_path / "out.npy")
    assert pred.shape == (2, 7, 1, 16, 16)
    assert np.isfinite(pred).all()


def test_cli_resume_flag(tmp_path, capsys):
    """--resume picks up <output_dir>/latest (restart-based crash recovery);
    with no checkpoint it starts fresh."""
    _run_main(["--config", "ci_smoke_seq", "--resume"], str(tmp_path))
    out1 = capsys.readouterr().out
    assert "no checkpoint found" in out1
    # second invocation resumes from the best_model written by the first
    _run_main(["--config", "ci_smoke_seq", "--resume"], str(tmp_path))
    out2 = capsys.readouterr().out
    assert "Resuming from" in out2
    assert "Restored checkpoint" in out2


def test_cli_export_stream_mode(tmp_path):
    """export-stream mode: checkpoint -> streaming (stateful) serving
    artifact with observe + per-horizon forecast programs."""
    import numpy as np
    from pl_convlstm_gan_tpu.serve import load_streaming_exported
    _run_main(["--config", "ci_smoke_seq"], str(tmp_path))
    art = tmp_path / "stream.jaxexport"
    _run_main(["--config", "ci_smoke_seq", "--mode", "export-stream",
               "--output", str(art)], str(tmp_path))
    server = load_streaming_exported(art.read_bytes())
    assert server.horizons == (3,)   # ci_smoke_seq output_frames
    state = server.init_state(2)
    frame = np.random.default_rng(0).random((2, 1, 16, 16)).astype(np.float32)
    state, now = server.observe(state, frame)
    assert now.shape == (2, 1, 16, 16)
    fc = server.forecast(state, 3)
    assert fc.shape == (2, 3, 1, 16, 16)
    assert np.isfinite(np.asarray(fc)).all()

    # --horizons: multiple forecast programs in one artifact
    art2 = tmp_path / "stream_multi.jaxexport"
    _run_main(["--config", "ci_smoke_seq", "--mode", "export-stream",
               "--output", str(art2), "--horizons", "2,4"], str(tmp_path))
    multi = load_streaming_exported(art2.read_bytes())
    assert multi.horizons == (2, 4)
    state2 = multi.init_state(1)
    state2, _ = multi.observe(state2, frame[:1])
    assert multi.forecast(state2, 2).shape == (1, 2, 1, 16, 16)
    assert multi.forecast(state2, 4).shape == (1, 4, 1, 16, 16)
    with pytest.raises(ValueError, match="not in exported set"):
        multi.forecast(state2, 3)


def test_cli_stream_mode(tmp_path):
    """stream mode: assimilate an input frame series frame-by-frame and write
    per-frame nowcasts + horizon forecasts — from a live checkpoint AND from
    an AOT streaming artifact, which must agree (same programs)."""
    import numpy as np
    _run_main(["--config", "ci_smoke_seq"], str(tmp_path))
    frames = np.random.default_rng(3).random((2, 4, 1, 16, 16)).astype(
        np.float32)
    np.save(tmp_path / "series.npy", frames)

    _run_main(["--config", "ci_smoke_seq", "--mode", "stream",
               "--input", str(tmp_path / "series.npy"),
               "--horizons", "2,4",
               "--output", str(tmp_path / "live.npz")], str(tmp_path))
    live = np.load(tmp_path / "live.npz")
    assert live["nowcasts"].shape == (2, 4, 1, 16, 16)
    assert live["forecast_2"].shape == (2, 2, 1, 16, 16)
    assert live["forecast_4"].shape == (2, 4, 1, 16, 16)
    assert all(np.isfinite(live[k]).all() for k in live.files)

    # same series through the exported artifact (serving-process path)
    art = tmp_path / "stream.jaxexport"
    _run_main(["--config", "ci_smoke_seq", "--mode", "export-stream",
               "--output", str(art), "--horizons", "2,4"], str(tmp_path))
    _run_main(["--config", "ci_smoke_seq", "--mode", "stream",
               "--input", str(tmp_path / "series.npy"),
               "--checkpoint", str(art), "--horizons", "2,4",
               "--output", str(tmp_path / "aot.npz")], str(tmp_path))
    aot = np.load(tmp_path / "aot.npz")
    for k in live.files:
        np.testing.assert_allclose(aot[k], live[k], atol=1e-5, rtol=1e-5)

    # a horizon the artifact lacks is a clear error, not a silent retrace
    with pytest.raises(SystemExit, match="missing"):
        _run_main(["--config", "ci_smoke_seq", "--mode", "stream",
                   "--input", str(tmp_path / "series.npy"),
                   "--checkpoint", str(art), "--horizons", "3"],
                  str(tmp_path))


def test_cli_stream_single_series_and_requires_input(tmp_path):
    """[T,C,H,W] input is treated as one stream; missing --input errors."""
    import numpy as np
    _run_main(["--config", "ci_smoke_seq"], str(tmp_path))
    series = np.random.default_rng(4).random((3, 1, 16, 16)).astype(np.float32)
    np.save(tmp_path / "one.npy", series)
    _run_main(["--config", "ci_smoke_seq", "--mode", "stream",
               "--input", str(tmp_path / "one.npy"),
               "--output", str(tmp_path / "one_out.npz")], str(tmp_path))
    out = np.load(tmp_path / "one_out.npz")
    assert out["nowcasts"].shape == (1, 3, 1, 16, 16)
    assert out["forecast_3"].shape == (1, 3, 1, 16, 16)  # config horizon
    with pytest.raises(SystemExit, match="requires --input"):
        _run_main(["--config", "ci_smoke_seq", "--mode", "stream"],
                  str(tmp_path))


def test_backend_probe_fails_fast(monkeypatch):
    """With a non-CPU platform and an unreachable backend, the CLI exits
    with an actionable message instead of hanging in the axon connect-retry
    loop; the probe is skipped under PLCG_NO_BACKEND_PROBE=1, on the
    jax.config CPU route (how this very test process runs), and on
    multi-host launches (a standalone probe child on one pod-slice host
    blocks on the other workers — healthy hardware would flunk the probe)."""
    from pl_convlstm_gan_tpu import cli
    from pl_convlstm_gan_tpu.utils import profiling

    def boom(timeout_s):
        raise AssertionError("probe must be skipped")

    # this test process forces CPU via jax.config (conftest) -> no probe
    monkeypatch.setattr(profiling, "probe_backend", boom)
    cli._require_reachable_backend()

    # non-CPU platform + dead backend -> SystemExit, not a hang
    monkeypatch.setattr(profiling, "_cpu_is_primary", lambda s: False)
    monkeypatch.setattr(profiling, "probe_backend", lambda timeout_s: False)
    with pytest.raises(SystemExit, match="unreachable"):
        cli._require_reachable_backend()

    # multi-host launch -> probe skipped even on a non-CPU platform
    monkeypatch.setenv("COORDINATOR_ADDRESS", "127.0.0.1:12345")
    monkeypatch.setattr(profiling, "probe_backend", boom)
    cli._require_reachable_backend()
    monkeypatch.delenv("COORDINATOR_ADDRESS")

    # explicit opt-out wins over everything
    monkeypatch.setenv("PLCG_NO_BACKEND_PROBE", "1")
    cli._require_reachable_backend()


def test_probe_backend_success_marker(monkeypatch, tmp_path):
    """A successful probe writes a TTL marker that short-circuits the next
    probe (no second backend spin-up); failures are never cached; and the
    hang-safe predicate requires the axon pool var to be UNSET for the env
    CPU route (with it set, even JAX_PLATFORMS=cpu dials the relay)."""
    from pl_convlstm_gan_tpu.utils import profiling

    marker = tmp_path / "ok_marker"
    monkeypatch.setattr(profiling, "_PROBE_MARKER", str(marker))
    # pin the env fingerprint inputs so the keyed-marker assertions below
    # hold regardless of the host environment (the axon pool var is preset
    # on the TPU-tunnel image)
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.delenv("PLCG_PROBE_TTL", raising=False)
    calls = []

    class _FakeCompleted:
        returncode = 0

    def fake_run(*a, **k):
        calls.append(1)
        return _FakeCompleted()

    monkeypatch.setattr("subprocess.run", fake_run)
    assert profiling.probe_backend(timeout_s=1.0)
    assert marker.exists() and len(calls) == 1
    assert profiling.probe_backend(timeout_s=1.0)   # marker hit, no subproc
    assert len(calls) == 1
    assert profiling.probe_backend(timeout_s=1.0, cache_ttl_s=0)
    assert len(calls) == 2                          # ttl=0 disables marker

    # the marker is keyed to the backend-relevant env: a success recorded
    # WITHOUT the axon pool var (backend may have silently fallen back to
    # CPU) must not be trusted by a tunnel-bound launch with it set
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    _FakeCompleted.returncode = 0
    assert profiling.probe_backend(timeout_s=1.0)
    assert len(calls) == 3                          # fingerprint miss -> re-probe
    assert profiling.probe_backend(timeout_s=1.0)
    assert len(calls) == 3                          # matching fingerprint hits
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS")

    # PLCG_PROBE_TTL=0 disables the marker without code changes
    monkeypatch.setenv("PLCG_PROBE_TTL", "0")
    assert profiling.probe_backend(timeout_s=1.0)
    assert len(calls) == 4
    monkeypatch.delenv("PLCG_PROBE_TTL")

    marker.unlink()
    _FakeCompleted.returncode = 1
    assert not profiling.probe_backend(timeout_s=1.0)
    assert not marker.exists()                      # failure not cached

    # hang-safe predicate: env CPU route needs the pool var unset. Stub out
    # profiling's jax so the config route (forced cpu by conftest in this
    # very process) doesn't mask the env-route logic under test.
    class _FakeCfg:
        jax_platforms = None

    class _FakeJax:
        config = _FakeCfg()

    monkeypatch.setattr(profiling, "jax", _FakeJax())
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    assert profiling.backend_touch_is_hang_safe()
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    assert not profiling.backend_touch_is_hang_safe()
