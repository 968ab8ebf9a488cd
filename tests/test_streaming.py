"""Streaming (stateful) inference: warm-state assimilation + branched
forecasts reproduce the batch ConvLSTMForecaster rollout exactly.

The reference has no inference path at all (SURVEY.md §0); these tests pin
the parity contract between the two deployment surfaces the build adds —
batch predict and the streaming API."""
import numpy as np
import jax.numpy as jnp
import pytest

from pl_convlstm_gan_tpu.config import Config
from pl_convlstm_gan_tpu.models import ConvLSTMForecaster
from pl_convlstm_gan_tpu.streaming import StreamingForecaster


def _tiny_cfg(**model_overrides):
    model = {"family": "forecaster", "hidden_dims": [8, 8],
             "input_frames": 3, "output_frames": 4}
    model.update(model_overrides)
    return Config.from_dict({
        "data": {"source": "synthetic"},
        "model": model,
        "training": {"batch_size": 8, "epochs": 1},
        "output": {"output_dir": "/tmp/unused_streaming"},
    })


def _init_pair(cfg, rng, b=2, hw=12):
    mc = cfg.model
    model = ConvLSTMForecaster(
        hidden_dims=tuple(mc.hidden_dims), input_frames=mc.input_frames,
        output_frames=mc.output_frames, in_channels=mc.in_channels,
        kernel_size=mc.kernel_size)
    frames = jnp.asarray(
        rng.random((b, mc.input_frames, mc.in_channels, hw, hw))
        .astype(np.float32))
    import jax
    variables = model.init(jax.random.PRNGKey(0), frames)
    return model, variables, frames


def test_streaming_matches_batch_rollout(rng):
    """observe_window + forecast(T_out - 1) == the batch scan rollout."""
    cfg = _tiny_cfg()
    model, variables, frames = _init_pair(cfg, rng)
    batch = model.apply(variables, frames)                # [B,4,1,H,W]

    sf = StreamingForecaster(cfg, variables)
    state = sf.init_state(frames.shape[0], frames.shape[3], frames.shape[4])
    state, nowcast = sf.observe_window(state, frames)
    rest = sf.forecast(state, cfg.model.output_frames - 1)
    rollout = jnp.concatenate([nowcast[:, None], rest], axis=1)

    assert rollout.shape == batch.shape
    np.testing.assert_allclose(np.asarray(rollout), np.asarray(batch),
                               atol=1e-5)


def test_streaming_frame_by_frame_equals_window(rng):
    """Assimilating one frame at a time reaches the same state/nowcast as
    the windowed observe (the online access pattern)."""
    cfg = _tiny_cfg()
    _, variables, frames = _init_pair(cfg, rng)
    sf = StreamingForecaster(cfg, variables)

    sw = sf.init_state(frames.shape[0], frames.shape[3], frames.shape[4])
    sw, now_w = sf.observe_window(sw, frames)

    ss = sf.init_state(frames.shape[0], frames.shape[3], frames.shape[4])
    for t in range(frames.shape[1]):
        ss, now_s = sf.observe(ss, frames[:, t])

    np.testing.assert_allclose(np.asarray(now_s), np.asarray(now_w),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sf.forecast(ss, 2)),
                               np.asarray(sf.forecast(sw, 2)), atol=1e-6)


def test_forecast_is_pure_branching(rng):
    """forecast() never mutates the stream: repeated/branched calls agree,
    and continued assimilation after a forecast is unaffected."""
    cfg = _tiny_cfg()
    _, variables, frames = _init_pair(cfg, rng)
    sf = StreamingForecaster(cfg, variables)
    state = sf.init_state(frames.shape[0], frames.shape[3], frames.shape[4])
    state, _ = sf.observe_window(state, frames)

    f1 = sf.forecast(state, 3)
    f2 = sf.forecast(state, 3)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))

    # longer horizon extends the shorter one (same autoregressive prefix)
    f5 = sf.forecast(state, 5)
    np.testing.assert_allclose(np.asarray(f5[:, :3]), np.asarray(f1),
                               atol=1e-6)

    # a branch doesn't disturb later assimilation: the state observed AFTER
    # forecasting matches a baseline stream that never forecast at all
    base = sf.init_state(frames.shape[0], frames.shape[3], frames.shape[4])
    base, _ = sf.observe_window(base, frames)       # no forecast issued
    base, now_base = sf.observe(base, f5[:, 0])
    s_a, now_a = sf.observe(state, f5[:, 0])        # after 3 forecasts
    np.testing.assert_array_equal(np.asarray(now_a), np.asarray(now_base))
    for (pa, pb) in zip(s_a.cells, base.cells):
        np.testing.assert_array_equal(np.asarray(pa[0]), np.asarray(pb[0]))
        np.testing.assert_array_equal(np.asarray(pa[1]), np.asarray(pb[1]))


def test_streaming_from_checkpoint(tmp_path, rng):
    """from_checkpoint restores trainer-written params and matches the batch
    predictor on the same checkpoint."""
    from pl_convlstm_gan_tpu.predict import load_predictor
    from pl_convlstm_gan_tpu.train import SequenceTrainer

    cfg = Config.from_dict({
        "data": {"source": "synthetic", "synthetic_num_sequences": 48,
                 "synthetic_image_size": 8},
        "model": {"family": "forecaster", "hidden_dims": [8],
                  "input_frames": 2, "output_frames": 3},
        "training": {"batch_size": 8, "epochs": 1, "learning_rate": 1e-3,
                     "use_split": True, "use_early_stopping": False},
        "output": {"output_dir": str(tmp_path / "out"), "log_interval": 100},
    })
    SequenceTrainer(config=cfg).train()
    ckpt = str(tmp_path / "out" / "best_model")

    frames = jnp.asarray(rng.random((2, 2, 1, 8, 8)).astype(np.float32))
    batch = load_predictor(cfg, ckpt)(frames)

    sf = StreamingForecaster.from_checkpoint(cfg, ckpt)
    state = sf.init_state(2, 8, 8)
    state, nowcast = sf.observe_window(state, frames)
    rest = sf.forecast(state, 2)
    rollout = jnp.concatenate([nowcast[:, None], rest], axis=1)
    np.testing.assert_allclose(np.asarray(rollout), np.asarray(batch),
                               atol=1e-5)


def test_streaming_forced_pallas_rejects_unsupported_shape(rng):
    """rollout_impl 'pallas' must fail loudly (not silently fall back) when
    the stream's shape family is outside the kernel's scope."""
    cfg = _tiny_cfg(rollout_impl="pallas")      # hidden 8ch: lanes don't tile
    _, variables, frames = _init_pair(cfg, rng)
    sf = StreamingForecaster(cfg, variables)
    state = sf.init_state(frames.shape[0], frames.shape[3], frames.shape[4])
    state, _ = sf.observe_window(state, frames)
    with pytest.raises(ValueError, match="shape/horizon"):
        sf.forecast(state, 3)


def test_streaming_rejects_generator_family():
    cfg = _tiny_cfg(family="generator", T=3, scale_factor=2)
    with pytest.raises(ValueError, match="sequence family"):
        StreamingForecaster(cfg, {"params": {}})
