"""int8 post-training-quantized serving tests (ops/quant.py,
models/quantized.py).

No reference counterpart (the reference is f32-only); the contract under
test is our own: primitive exactness (int8 conv == int32 arithmetic),
quantization error bounds, and the end-to-end quantized rollout tracking the
f32 scan closely with NO error growth across autoregressive steps (the f32
carried state is the design invariant that prevents drift)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pl_convlstm_gan_tpu.config import Config
from pl_convlstm_gan_tpu.models import ConvLSTMForecaster
from pl_convlstm_gan_tpu.models.quantized import (prepare_int8_forecaster,
                                                  rollout_int8,
                                                  rollout_int8_from_state)
from pl_convlstm_gan_tpu.ops.quant import (QMAX, conv2d_int8, dynamic_scale,
                                           quantize_act, quantize_weight)


def test_conv2d_int8_exact_int32_arithmetic():
    """The s8 x s8 -> s32 conv is EXACT integer arithmetic (no rounding)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (2, 9, 9, 5)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, 5, 8)), jnp.int8)
    out = conv2d_int8(x, w)
    ref = jax.lax.conv_general_dilated(
        x.astype(jnp.int32), w.astype(jnp.int32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert out.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_quantize_weight_per_channel_bound():
    """Dequantized weights are within half a quantization step per element,
    per OUTPUT channel (the per-channel scale is what keeps a small-magnitude
    channel from inheriting a large channel's step size)."""
    rng = np.random.default_rng(1)
    w = rng.normal(size=(3, 3, 4, 6)).astype(np.float32)
    w[..., 2] *= 1e-3   # one tiny channel: per-tensor scales would destroy it
    wq, scale = quantize_weight(jnp.asarray(w))
    assert wq.dtype == jnp.int8 and scale.shape == (6,)
    err = np.abs(np.asarray(wq, np.float32) * np.asarray(scale) - w)
    assert (err <= np.asarray(scale) / 2 + 1e-9).all()


def test_quantize_weight_zero_channel_safe():
    w = jnp.zeros((3, 3, 2, 4))
    wq, scale = quantize_weight(w)
    assert np.isfinite(np.asarray(scale)).all() and (scale > 0).all()
    assert (np.asarray(wq) == 0).all()


def test_quantize_act_rounds_and_saturates():
    x = jnp.asarray([0.0, 0.5, -0.5, 1.0, -1.0, 3.0, -3.0])
    q = quantize_act(x, 1.0 / QMAX)
    assert q.dtype == jnp.int8
    np.testing.assert_array_equal(
        np.asarray(q), [0, 64, -64, 127, -127, 127, -127])
    # dynamic scale makes any tensor representable without saturation, and
    # is PER-SAMPLE: sample 0's huge magnitude must not coarsen sample 1's
    # quantization grid (determinism under dynamic batching, DP exactness)
    xb = jnp.stack([x * 100.0, x])
    s = dynamic_scale(xb)
    assert s.shape == (2, 1)
    assert float(jnp.max(jnp.abs(xb / s))) <= QMAX + 1e-6
    assert float(s[1, 0]) * 100 == pytest.approx(float(s[0, 0]))


def _tiny(b=2, t_in=4, t_out=8, hw=12, hidden=(12, 12)):
    m = ConvLSTMForecaster(hidden_dims=hidden, input_frames=t_in,
                           output_frames=t_out)
    frames = jax.random.uniform(jax.random.PRNGKey(1), (b, t_in, 1, hw, hw))
    params = m.init(jax.random.PRNGKey(0), frames)
    return m, params, frames


def test_rollout_int8_tracks_float():
    m, params, frames = _tiny()
    ref = np.asarray(m.apply(params, frames))
    out = np.asarray(jax.jit(
        lambda f: rollout_int8(prepare_int8_forecaster(params), f,
                               m.output_frames))(frames))
    assert out.shape == ref.shape and out.dtype == np.float32
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    # random-init weights are the WORST case (arbitrary small output scale);
    # measured ~2.5% — bound with headroom but tight enough to catch a
    # broken scale (any scale bug lands >100%)
    assert rel < 0.08, rel


def test_rollout_int8_error_does_not_compound():
    """Per-step error must stay flat across the autoregressive decode: the
    carried h/c are f32, so quantization error enters each step afresh
    instead of accumulating in the state."""
    m, params, frames = _tiny(t_out=12)
    ref = np.asarray(m.apply(params, frames))
    out = np.asarray(rollout_int8(prepare_int8_forecaster(params), frames,
                                  m.output_frames))
    per_frame = (np.abs(out - ref).mean(axis=(0, 2, 3, 4))
                 / np.abs(ref).mean())
    early, late = per_frame[:3].mean(), per_frame[-3:].mean()
    assert late < 3 * early + 1e-3, (early, late)


def test_rollout_int8_three_cells_and_unequal_widths():
    """The int8 path has no equal-width family restriction (unlike the Pallas
    kernel): mixed hidden widths quantize and run."""
    m, params, frames = _tiny(hidden=(8, 16, 8))
    ref = np.asarray(m.apply(params, frames))
    out = np.asarray(rollout_int8(prepare_int8_forecaster(params), frames,
                                  m.output_frames))
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert rel < 0.08, rel


def test_rollout_int8_from_state_matches_cold_decode():
    """Warm-start decode from a (float-assimilated) state equals the float
    scan's decode within the quantization tolerance, including bf16 states
    (the streaming case)."""
    m, params, frames = _tiny()
    q = prepare_int8_forecaster(params)
    ref = np.asarray(m.apply(params, frames))
    # assimilate with the FLOAT model (streaming observe), then decode int8
    from pl_convlstm_gan_tpu.models.forecaster import _StackedStepCore
    core = _StackedStepCore(hidden_dims=m.hidden_dims, out_channels=1,
                            kernel_size=3, impl="xla", dtype=jnp.float32,
                            param_dtype=jnp.float32)
    core_vars = {"params": params["params"]["core"]}
    seq = jnp.transpose(frames, (1, 0, 3, 4, 2))
    b, _, _, hw, _ = frames.shape
    zeros = lambda f: jnp.zeros((b, hw, hw, f), jnp.bfloat16)
    carry = (tuple((zeros(f), zeros(f)) for f in m.hidden_dims),
             zeros(1))
    for t in range(frames.shape[1]):
        flags = jnp.ones((b,), bool)
        carry, out0 = core.apply(core_vars, carry,
                                 (seq[t].astype(jnp.bfloat16), flags,
                                  jnp.zeros_like(seq[t], jnp.bfloat16),
                                  jnp.zeros((b,), bool)))
    states, prev = carry
    preds, prev2, states2 = rollout_int8_from_state(
        q, prev, states, m.output_frames - 1)
    assert preds.shape == (b, m.output_frames - 1, 1, hw, hw)
    rel = (np.abs(np.asarray(preds) - ref[:, 1:]).mean()
           / np.abs(ref[:, 1:]).mean())
    # bf16 assimilation + int8 decode vs f32 reference
    assert rel < 0.12, rel
    assert states2[0][0].dtype == jnp.float32


def _cfg(impl, t_in=4, t_out=8, hidden=(12, 12)):
    return Config.from_dict({
        "data": {"source": "synthetic"},
        "model": {"family": "forecaster", "hidden_dims": list(hidden),
                  "in_channels": 1, "input_frames": t_in,
                  "output_frames": t_out, "rollout_impl": impl},
        "training": {"batch_size": 8, "epochs": 1},
        "output": {"output_dir": "/tmp/unused_quant"},
    })


def test_config_accepts_int8_rollout_impl():
    _cfg("int8").validate()
    with pytest.raises(ValueError, match="rollout_impl"):
        _cfg("int4").validate()


def test_predict_int8_impl(tmp_path):
    """build_predict_fn(rollout_impl='int8') serves the quantized rollout:
    same shapes/window contract as the float path, outputs within the
    quantization tolerance, and the closure jits."""
    from pl_convlstm_gan_tpu.predict import build_predict_fn
    from pl_convlstm_gan_tpu.train.checkpoint import save_checkpoint
    cfg = _cfg("int8")
    m, params, frames = _tiny()
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, {"params": params}, {"epoch": 0, "rmse": 1.0})
    fn = jax.jit(build_predict_fn(cfg, ckpt))
    out = np.asarray(fn(frames))
    ref = np.asarray(m.apply(params, frames))
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert out.shape == ref.shape and rel < 0.08
    with pytest.raises(ValueError, match="input window"):
        build_predict_fn(cfg, ckpt)(frames[:, :2])


def test_predict_int8_data_parallel(tmp_path):
    """int8 predict composes with batch-sharded DP (plain XLA — shard_map
    partitions it), and the per-SAMPLE dynamic frame scale makes the sharded
    result EXACTLY equal to single-device (a whole-batch scale would differ
    across shard-local batches)."""
    import jax

    from pl_convlstm_gan_tpu.predict import load_predictor
    from pl_convlstm_gan_tpu.train.checkpoint import save_checkpoint
    cfg = _cfg("int8")
    m, params, _ = _tiny(b=8)
    # heterogeneous magnitudes across the batch: the case a whole-batch
    # scale would get wrong under sharding
    frames = jax.random.uniform(jax.random.PRNGKey(2), (8, 4, 1, 12, 12))
    frames = frames * jnp.linspace(0.1, 10.0, 8)[:, None, None, None, None]
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, {"params": params}, {"epoch": 0, "rmse": 1.0})
    single = load_predictor(cfg, ckpt, data_parallel="off")
    dp = load_predictor(cfg, ckpt, data_parallel="require")
    out_dp = dp(frames)
    assert len(out_dp.sharding.device_set) == jax.device_count() == 8
    np.testing.assert_array_equal(np.asarray(out_dp),
                                  np.asarray(single(frames)))


def test_export_int8_artifact_roundtrip(tmp_path):
    """A config with rollout_impl 'int8' AOT-exports the QUANTIZED rollout
    (int8 convs are portable StableHLO, unlike the Mosaic kernel): the
    serialized artifact reproduces in-process int8 predict exactly and is
    batch-polymorphic."""
    from pl_convlstm_gan_tpu.predict import build_predict_fn
    from pl_convlstm_gan_tpu.serve import export_model, load_exported
    from pl_convlstm_gan_tpu.train.checkpoint import save_checkpoint
    cfg = _cfg("int8")
    m, params, frames = _tiny()
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, {"params": params}, {"epoch": 0, "rmse": 1.0})
    blob = export_model(cfg, ckpt, (frames[:1],))
    serve = load_exported(blob)
    inproc = jax.jit(build_predict_fn(cfg, ckpt))
    np.testing.assert_array_equal(np.asarray(serve(frames)),
                                  np.asarray(inproc(frames)))
    # quantized, not the float program: far from f32 at f32 tolerance
    ref = np.asarray(m.apply(params, frames))
    assert np.abs(np.asarray(serve(frames)) - ref).max() > 1e-6
    # batch polymorphism survives the int8 ops (b=3 != example b=2)
    out3 = serve(frames[:1].repeat(3, axis=0))
    assert out3.shape[0] == 3


def test_streaming_export_int8(tmp_path):
    """An int8 config exports a streaming artifact whose FORECAST programs
    are the quantized decode (exact vs in-process int8 streaming; observe
    stays float), with the 'rollout: int8' header marker and NO bf16 kernel
    entries that could shadow the quantized path on TPU."""
    from pl_convlstm_gan_tpu.serve import (export_streaming,
                                           load_streaming_exported,
                                           parse_stream_header)
    from pl_convlstm_gan_tpu.streaming import StreamingForecaster
    from pl_convlstm_gan_tpu.train.checkpoint import save_checkpoint
    cfg = _cfg("int8")
    m, params, frames = _tiny()
    b, _, _, hw, _ = frames.shape
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, {"params": params}, {"epoch": 0, "rmse": 1.0})

    with pytest.raises(ValueError, match="contradicts"):
        export_streaming(cfg, ckpt, hw, hw, horizons=(3,),
                         tpu_kernel="require")

    blob = export_streaming(cfg, ckpt, hw, hw, horizons=(3,))
    meta, _ = parse_stream_header(blob)
    assert meta["rollout"] == "int8"
    assert not meta.get("pallas_horizons")
    server = load_streaming_exported(blob)

    sf = StreamingForecaster(cfg, params)
    ref_state = sf.init_state(b, hw, hw)
    state = server.init_state(b)
    for t in range(frames.shape[1]):
        ref_state, ref_now = sf.observe(ref_state, frames[:, t])
        state, now = server.observe(state, frames[:, t])
        np.testing.assert_allclose(np.asarray(now), np.asarray(ref_now),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(server.forecast(state, 3)),
                                  np.asarray(sf.forecast(ref_state, 3)))
    # and it IS quantized: differs from the float streaming decode
    sf_f = StreamingForecaster(_cfg("xla"), params)
    st_f = sf_f.init_state(b, hw, hw)
    for t in range(frames.shape[1]):
        st_f, _ = sf_f.observe(st_f, frames[:, t])
    assert np.abs(np.asarray(server.forecast(state, 3))
                  - np.asarray(sf_f.forecast(st_f, 3))).max() > 1e-6


def test_streaming_int8_forecast():
    """StreamingForecaster(rollout_impl='int8'): float observe (assimilation
    unchanged — bit-identical state to the xla configuration), quantized
    decode within tolerance of the float forecast."""
    from pl_convlstm_gan_tpu.streaming import StreamingForecaster
    m, params, frames = _tiny()
    b, _, _, hw, _ = frames.shape
    sf_q = StreamingForecaster(_cfg("int8"), params)
    sf_f = StreamingForecaster(_cfg("xla"), params)
    st_q, now_q = sf_q.observe_window(sf_q.init_state(b, hw, hw), frames)
    st_f, now_f = sf_f.observe_window(sf_f.init_state(b, hw, hw), frames)
    np.testing.assert_array_equal(np.asarray(now_q), np.asarray(now_f))
    fq = np.asarray(sf_q.forecast(st_q, 7))
    ff = np.asarray(sf_f.forecast(st_f, 7))
    rel = np.abs(fq - ff).mean() / np.abs(ff).mean()
    assert fq.shape == ff.shape and rel < 0.08, rel
