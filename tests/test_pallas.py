"""Pallas fused ConvLSTM kernel: numerical parity (forward + gradients) against the
XLA path, under interpreter mode on CPU. On TPU the same tests run compiled."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pl_convlstm_gan_tpu.ops.convlstm import ConvLSTMParams, convlstm_step_xla
from pl_convlstm_gan_tpu.ops.pallas.convlstm_kernel import (convlstm_step_pallas,
                                                            pallas_step_fits)


def _make(rng, b=2, hgt=8, wid=8, cx=3, ch=4, k=3):
    x = jnp.asarray(rng.standard_normal((b, hgt, wid, cx), dtype=np.float32))
    h = jnp.asarray(rng.standard_normal((b, hgt, wid, ch), dtype=np.float32))
    c = jnp.asarray(rng.standard_normal((b, hgt, wid, ch), dtype=np.float32))
    kern = jnp.asarray(
        rng.standard_normal((k, k, cx + ch, 4 * ch), dtype=np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal(4 * ch, dtype=np.float32) * 0.1)
    return ConvLSTMParams(kern, bias), x, h, c


@pytest.mark.parametrize("shape", [(2, 8, 8, 3, 4), (1, 16, 12, 1, 8),
                                   (2, 8, 8, 4, 4)])
def test_forward_parity(rng, shape):
    b, hgt, wid, cx, ch = shape
    params, x, h, c = _make(rng, b, hgt, wid, cx, ch)
    h_ref, c_ref = convlstm_step_xla(params, x, h, c)
    h_pal, c_pal = convlstm_step_pallas(params, x, h, c)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_ref), atol=1e-5)


def test_forward_parity_k5(rng):
    params, x, h, c = _make(rng, b=1, hgt=8, wid=8, cx=2, ch=4, k=5)
    h_ref, c_ref = convlstm_step_xla(params, x, h, c)
    h_pal, c_pal = convlstm_step_pallas(params, x, h, c)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_ref), atol=1e-5)


def test_gradient_parity(rng):
    """custom_vjp backward must match XLA autodiff on every input."""
    params, x, h, c = _make(rng, b=2, hgt=8, wid=8, cx=3, ch=4)

    def loss(fn, kern, bias, x_, h_, c_):
        hn, cn = fn(ConvLSTMParams(kern, bias), x_, h_, c_)
        # mix h and c grads with different weights to exercise both paths
        return jnp.sum(hn * 1.3) + jnp.sum(jnp.square(cn)) * 0.7

    g_ref = jax.grad(lambda *a: loss(convlstm_step_xla, *a),
                     argnums=(0, 1, 2, 3, 4))(params.kernel, params.bias, x, h, c)
    g_pal = jax.grad(lambda *a: loss(convlstm_step_pallas, *a),
                     argnums=(0, 1, 2, 3, 4))(params.kernel, params.bias, x, h, c)
    names = ["dkernel", "dbias", "dx", "dh", "dc"]
    for name, a, b in zip(names, g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4,
                                   err_msg=name)


def test_fallback_for_oversize_shapes(rng):
    """Shapes beyond the VMEM budget silently use the XLA path (same results)."""
    assert not pallas_step_fits(512, 512, 64, 64)
    assert pallas_step_fits(32, 32, 16, 16)


def test_inside_scan(rng):
    """The kernel must compose with lax.scan over time (the model's usage)."""
    params, x, h, c = _make(rng, b=1, hgt=8, wid=8, cx=4, ch=4)
    xs = jnp.stack([x, x * 0.5, x * 0.1])

    def body(carry, x_t):
        h_, c_ = carry
        h_, c_ = convlstm_step_pallas(params, x_t, h_, c_)
        return (h_, c_), h_

    (hT, cT), hs = jax.lax.scan(body, (h, c), xs)

    def body_ref(carry, x_t):
        h_, c_ = carry
        h_, c_ = convlstm_step_xla(params, x_t, h_, c_)
        return (h_, c_), h_

    (hT_r, cT_r), hs_r = jax.lax.scan(body_ref, (h, c), xs)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_r), atol=1e-5)


def test_generator_with_pallas_impl_matches_xla(rng):
    """Full Generator with convlstm_impl='pallas' vs 'xla', identical params."""
    from pl_convlstm_gan_tpu.models import Generator

    b, t, h, w, lu_c = 1, 2, 8, 8, 2
    rain = jnp.asarray(rng.standard_normal((b, t, 1, h, w), dtype=np.float32))
    dem = jnp.asarray(rng.standard_normal((b, 1, h, w), dtype=np.float32))
    lu = jnp.asarray(rng.standard_normal((b, lu_c, h, w), dtype=np.float32))

    m_x = Generator(hidden_dims=(8, 8), lu_channels=lu_c, scale_factor=2,
                    convlstm_impl="xla")
    m_p = Generator(hidden_dims=(8, 8), lu_channels=lu_c, scale_factor=2,
                    convlstm_impl="pallas")
    params = m_x.init(jax.random.PRNGKey(0), rain, dem, lu)
    out_x = m_x.apply(params, rain, dem, lu)
    out_p = m_p.apply(params, rain, dem, lu)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-5)


def test_tiled_kernel_parity(rng):
    """Row-tiled (HBM-resident input, manual halo DMA) variant vs XLA."""
    from pl_convlstm_gan_tpu.ops.pallas.convlstm_kernel import (_run_kernel_tiled,
                                                                pallas_tiled_fits)
    params, x, h, c = _make(rng, b=2, hgt=32, wid=16, cx=3, ch=4)
    h_ref, c_ref = convlstm_step_xla(params, x, h, c)
    hn, cn = _run_kernel_tiled(params.kernel, params.bias, x, h, c, False)
    np.testing.assert_allclose(np.asarray(hn), np.asarray(h_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cn), np.asarray(c_ref), atol=1e-5)
    # the flagship bench shape must be coverable by the tiled path (bf16)
    assert pallas_tiled_fits(128, 128, 64, 64, itemsize=2)


def test_gradient_mixed_dtypes(rng):
    """f32 params with bf16 activations (no caller pre-cast): the custom_vjp
    backward must return cotangents matching each primal's dtype."""
    params, x, h, c = _make(rng, b=1, hgt=8, wid=8, cx=3, ch=4)
    xb, hb, cb = (a.astype(jnp.bfloat16) for a in (x, h, c))

    def loss(kern, bias, x_, h_, c_):
        hn, cn = convlstm_step_pallas(ConvLSTMParams(kern, bias), x_, h_, c_)
        return jnp.sum(hn.astype(jnp.float32)) + jnp.sum(cn.astype(jnp.float32))

    g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(params.kernel, params.bias,
                                                xb, hb, cb)
    assert g[0].dtype == params.kernel.dtype     # f32
    assert g[1].dtype == params.bias.dtype       # f32
    assert g[2].dtype == jnp.bfloat16 and g[3].dtype == jnp.bfloat16
    for a in g:
        assert np.isfinite(np.asarray(a, np.float32)).all()


def test_rollout_kernel_matches_forecaster():
    """Multi-step VMEM-resident rollout kernel == ConvLSTMForecaster free
    rollout (encode + autoregressive decode), interpret mode, f32 exactness."""
    import numpy as np
    from pl_convlstm_gan_tpu.models import ConvLSTMForecaster
    from pl_convlstm_gan_tpu.ops.pallas.rollout_kernel import rollout_pallas

    rng = np.random.default_rng(0)
    b, t_in, t_out, size, ch = 2, 3, 4, 8, 8
    frames = jnp.asarray(rng.random((b, t_in, 1, size, size)), jnp.float32)
    model = ConvLSTMForecaster(hidden_dims=(ch, ch), input_frames=t_in,
                               output_frames=t_out)
    params = model.init(jax.random.PRNGKey(0), frames)
    ref = model.apply(params, frames)
    out = rollout_pallas(params, frames, t_out, compute_dtype=jnp.float32)
    assert out.shape == ref.shape == (b, t_out, 1, size, size)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_rollout_kernel_odd_step_count():
    """t_in + t_out - 1 odd exercises the unrolled trailing step."""
    import numpy as np
    from pl_convlstm_gan_tpu.models import ConvLSTMForecaster
    from pl_convlstm_gan_tpu.ops.pallas.rollout_kernel import rollout_pallas

    rng = np.random.default_rng(1)
    b, t_in, t_out, size, ch = 1, 2, 4, 8, 8    # steps = 5 (odd)
    frames = jnp.asarray(rng.random((b, t_in, 1, size, size)), jnp.float32)
    model = ConvLSTMForecaster(hidden_dims=(ch, ch), input_frames=t_in,
                               output_frames=t_out)
    params = model.init(jax.random.PRNGKey(3), frames)
    ref = model.apply(params, frames)
    out = rollout_pallas(params, frames, t_out, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("horizon", [1, 3, 4])  # min/odd/even step paths
def test_rollout_kernel_warm_start_matches_streaming_scan(horizon):
    """Warm-start kernel (state seeded from a live stream) == the streaming
    XLA forecast scan branched from the same state, interpret mode, f32."""
    import numpy as np
    from pl_convlstm_gan_tpu.config import Config
    from pl_convlstm_gan_tpu.models import ConvLSTMForecaster
    from pl_convlstm_gan_tpu.ops.pallas.rollout_kernel import (
        rollout_pallas_from_state)
    from pl_convlstm_gan_tpu.streaming import StreamingForecaster

    cfg = Config.from_dict({
        "data": {"source": "synthetic"},
        "model": {"family": "forecaster", "hidden_dims": [8, 8],
                  "input_frames": 3, "output_frames": 4,
                  "rollout_impl": "xla"},
        "training": {"batch_size": 8, "epochs": 1},
        "output": {"output_dir": "/tmp/unused_warm_rollout"},
    })
    rng = np.random.default_rng(7)
    b, hw = 2, 8
    frames = jnp.asarray(rng.random((b, 3, 1, hw, hw)), jnp.float32)
    model = ConvLSTMForecaster(hidden_dims=(8, 8), input_frames=3,
                               output_frames=4)
    variables = model.init(jax.random.PRNGKey(5), frames)

    sf = StreamingForecaster(cfg, variables)
    state = sf.init_state(b, hw, hw)
    state, _ = sf.observe_window(state, frames)     # warm, non-trivial state
    ref = sf.forecast(state, horizon)               # XLA scan branch

    out = rollout_pallas_from_state(variables["params"]["core"],
                                    state.cells, state.prev_out,
                                    horizon, compute_dtype=jnp.float32)
    assert out.shape == ref.shape == (b, horizon, 1, hw, hw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_rollout_fits_gate():
    from pl_convlstm_gan_tpu.ops.pallas.rollout_kernel import rollout_pallas_fits
    # bench/serving shape family: supported
    assert rollout_pallas_fits(5, 10, 4, 1, 128, 128, (64, 64), 3, 2)
    # warm (streaming) variant at the serving shape: supported
    assert rollout_pallas_fits(1, 30, 4, 1, 128, 128, (64, 64), 3, 2,
                               warm=True)
    # 3 equal-width cells (the flagship nowcast_128 family): supported
    assert rollout_pallas_fits(5, 20, 4, 1, 128, 128, (64, 64, 64), 3, 2)
    assert rollout_pallas_fits(1, 30, 1, 1, 128, 128, (64, 64, 64), 3, 2,
                               warm=True)
    # auto (implicit) dispatch is limited to on-device-validated families:
    # both 2- and 3-cell are hardware-validated (v5e 2026-08-19, -36.7% at
    # the flagship 3-cell shape) so auto serves both
    assert rollout_pallas_fits(5, 10, 4, 1, 128, 128, (64, 64), 3, 2,
                               auto=True)
    assert rollout_pallas_fits(5, 20, 4, 1, 128, 128, (64, 64, 64), 3, 2,
                               auto=True)
    # auto refuses spatial extents whose Mosaic compile has never finished
    # on hardware (256px cold resident FITS the VMEM budget, but three
    # timed-out compile attempts mean a user-facing call must not serve it
    # implicitly — _MOSAIC_VALIDATED_MAX_DIM); explicit opt-in still may
    assert rollout_pallas_fits(5, 30, 1, 1, 256, 256, (64, 64), 3, 2)
    assert not rollout_pallas_fits(5, 30, 1, 1, 256, 256, (64, 64), 3, 2,
                                   auto=True)
    # unequal widths / 4 layers / multi-channel input: fall back
    assert not rollout_pallas_fits(5, 10, 4, 1, 128, 128, (64, 32), 3, 2)
    assert not rollout_pallas_fits(5, 10, 4, 1, 128, 128, (64,) * 4, 3, 2)
    assert not rollout_pallas_fits(5, 10, 4, 1, 128, 128, (64, 64, 32), 3, 2)
    assert not rollout_pallas_fits(5, 10, 4, 3, 128, 128, (64, 64), 3, 2)


def test_rollout_kernel_three_cells_matches_forecaster():
    """3-cell cold-start kernel == 3-cell ConvLSTMForecaster free rollout
    (the flagship nowcast_128 family), interpret mode, f32 exactness."""
    import numpy as np
    from pl_convlstm_gan_tpu.models import ConvLSTMForecaster
    from pl_convlstm_gan_tpu.ops.pallas.rollout_kernel import rollout_pallas

    rng = np.random.default_rng(11)
    b, t_in, t_out, size, ch = 2, 3, 4, 8, 8
    frames = jnp.asarray(rng.random((b, t_in, 1, size, size)), jnp.float32)
    model = ConvLSTMForecaster(hidden_dims=(ch, ch, ch), input_frames=t_in,
                               output_frames=t_out)
    params = model.init(jax.random.PRNGKey(2), frames)
    ref = model.apply(params, frames)
    out = rollout_pallas(params, frames, t_out, compute_dtype=jnp.float32)
    assert out.shape == ref.shape == (b, t_out, 1, size, size)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("horizon", [1, 3, 4])  # min/odd/even step paths
def test_rollout_kernel_three_cell_warm_start(horizon):
    """3-cell warm-start kernel == the streaming XLA forecast scan branched
    from the same live state, interpret mode, f32."""
    import numpy as np
    from pl_convlstm_gan_tpu.config import Config
    from pl_convlstm_gan_tpu.models import ConvLSTMForecaster
    from pl_convlstm_gan_tpu.ops.pallas.rollout_kernel import (
        rollout_pallas_from_state)
    from pl_convlstm_gan_tpu.streaming import StreamingForecaster

    cfg = Config.from_dict({
        "data": {"source": "synthetic"},
        "model": {"family": "forecaster", "hidden_dims": [8, 8, 8],
                  "input_frames": 3, "output_frames": 4,
                  "rollout_impl": "xla"},
        "training": {"batch_size": 8, "epochs": 1},
        "output": {"output_dir": "/tmp/unused_warm_rollout3"},
    })
    rng = np.random.default_rng(13)
    b, hw = 2, 8
    frames = jnp.asarray(rng.random((b, 3, 1, hw, hw)), jnp.float32)
    model = ConvLSTMForecaster(hidden_dims=(8, 8, 8), input_frames=3,
                               output_frames=4)
    variables = model.init(jax.random.PRNGKey(6), frames)

    sf = StreamingForecaster(cfg, variables)
    state = sf.init_state(b, hw, hw)
    state, _ = sf.observe_window(state, frames)     # warm, non-trivial state
    ref = sf.forecast(state, horizon)               # XLA scan branch

    out = rollout_pallas_from_state(variables["params"]["core"],
                                    state.cells, state.prev_out,
                                    horizon, compute_dtype=jnp.float32)
    assert out.shape == ref.shape == (b, horizon, 1, hw, hw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("cells_n", [2, 3])
def test_rollout_kernel_streamed_io_matches_forecaster(cells_n):
    """Streamed-I/O variant (HBM frames/outputs, double-buffered DMA — the
    256x256 serving budget's variant) == the forecaster free rollout,
    interpret mode, f32 exactness. Odd t_in exercises the frame-prefetch
    parity; t_out=4 exercises staging-slot reuse (frame t_o-2 wait)."""
    import numpy as np
    from pl_convlstm_gan_tpu.models import ConvLSTMForecaster
    from pl_convlstm_gan_tpu.ops.pallas.rollout_kernel import rollout_pallas

    rng = np.random.default_rng(17)
    b, t_in, t_out, size, ch = 2, 3, 4, 8, 8
    frames = jnp.asarray(rng.random((b, t_in, 1, size, size)), jnp.float32)
    model = ConvLSTMForecaster(hidden_dims=(ch,) * cells_n,
                               input_frames=t_in, output_frames=t_out)
    params = model.init(jax.random.PRNGKey(4), frames)
    ref = model.apply(params, frames)
    out = rollout_pallas(params, frames, t_out, compute_dtype=jnp.float32,
                         io_mode="streamed")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("cells_n,horizon", [(2, 1), (2, 4), (3, 3)])
def test_rollout_kernel_streamed_io_warm_start(cells_n, horizon):
    """Streamed-I/O warm start (seeds staged through one VMEM buffer from
    HBM) == the streaming XLA forecast scan, interpret mode, f32."""
    import numpy as np
    from pl_convlstm_gan_tpu.config import Config
    from pl_convlstm_gan_tpu.models import ConvLSTMForecaster
    from pl_convlstm_gan_tpu.ops.pallas.rollout_kernel import (
        rollout_pallas_from_state)
    from pl_convlstm_gan_tpu.streaming import StreamingForecaster

    cfg = Config.from_dict({
        "data": {"source": "synthetic"},
        "model": {"family": "forecaster", "hidden_dims": [8] * cells_n,
                  "input_frames": 3, "output_frames": 4,
                  "rollout_impl": "xla"},
        "training": {"batch_size": 8, "epochs": 1},
        "output": {"output_dir": "/tmp/unused_warm_streamed"},
    })
    rng = np.random.default_rng(19)
    b, hw = 2, 8
    frames = jnp.asarray(rng.random((b, 3, 1, hw, hw)), jnp.float32)
    model = ConvLSTMForecaster(hidden_dims=(8,) * cells_n, input_frames=3,
                               output_frames=4)
    variables = model.init(jax.random.PRNGKey(8), frames)

    sf = StreamingForecaster(cfg, variables)
    state = sf.init_state(b, hw, hw)
    state, _ = sf.observe_window(state, frames)
    ref = sf.forecast(state, horizon)
    out = rollout_pallas_from_state(variables["params"]["core"],
                                    state.cells, state.prev_out, horizon,
                                    compute_dtype=jnp.float32,
                                    io_mode="streamed")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_rollout_kernel_streamed_io_phase_sweep():
    """Every (t_in parity) x (t_out 1..4) combination of the streamed
    variant's DMA phase arithmetic: frame-prefetch slot parity, output
    staging-slot reuse (wait on frame t_o-2), and the final drain (last one
    or two frames) all depend on these statics — a slot-parity bug shows up
    as wrong values on specific (t_in, t_out) combos only."""
    import numpy as np
    from pl_convlstm_gan_tpu.models import ConvLSTMForecaster
    from pl_convlstm_gan_tpu.ops.pallas.rollout_kernel import rollout_pallas

    rng = np.random.default_rng(23)
    b, size, ch = 1, 8, 8
    for t_in in (1, 2):          # odd/even encode phase (3 == 1 mod 2)
        for t_out in (1, 2, 3, 4):   # drain sizes + both reuse parities
            frames = jnp.asarray(rng.random((b, t_in, 1, size, size)),
                                 jnp.float32)
            model = ConvLSTMForecaster(hidden_dims=(ch, ch),
                                       input_frames=t_in,
                                       output_frames=t_out)
            params = model.init(jax.random.PRNGKey(t_in * 10 + t_out),
                                frames)
            ref = model.apply(params, frames)
            out = rollout_pallas(params, frames, t_out,
                                 compute_dtype=jnp.float32,
                                 io_mode="streamed")
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5,
                err_msg=f"t_in={t_in} t_out={t_out}")


def test_rollout_io_mode_selection():
    """The I/O-variant picker and the fits gate at the 256x256 serving
    shapes: cold fits resident; warm ONLY fits streamed (the round-3 gap the
    streamed variant exists to close); auto (implicit) dispatch admits
    streamed (hardware-validated at 128px, -30.3%) but the >128px spatial
    envelope still excludes the 256px family (four timed-out compiles)."""
    from pl_convlstm_gan_tpu.ops.pallas import rollout_kernel as rk

    # bench shape: resident everywhere
    assert rk.pick_io_mode(5, 10, 128, 128, 64, 2) == "resident"
    # 256x256 serving family (config #5): cold resident, warm streamed-only
    assert rk.pick_io_mode(5, 30, 256, 256, 64, 2) == "resident"
    assert rk.pick_io_mode(1, 30, 256, 256, 64, 2, warm=True) == "streamed"
    assert rk.rollout_pallas_fits(1, 30, 1, 1, 256, 256, (64, 64), 3, 2,
                                  warm=True)
    # streamed is validated for implicit selection (the picker itself has no
    # spatial envelope — that lives in rollout_pallas_fits, asserted below)
    assert rk.pick_io_mode(1, 30, 256, 256, 64, 2, warm=True,
                           auto=True) == "streamed"
    # ... but the full auto gate refuses the 256px family: envelope blocks
    assert not rk.rollout_pallas_fits(1, 30, 1, 1, 256, 256, (64, 64), 3, 2,
                                      warm=True, auto=True)
    # a <=128px shape whose horizon overflows the resident VMEM I/O block is
    # the case the flipped gate serves: streamed picks, and auto accepts it
    long_h = rk.pick_io_mode(1, 400, 128, 128, 64, 4, warm=True)
    assert long_h == "streamed"
    assert rk.pick_io_mode(1, 400, 128, 128, 64, 4, warm=True,
                           auto=True) == "streamed"
    assert rk.rollout_pallas_fits(1, 400, 1, 1, 128, 128, (64, 64), 3, 4,
                                  warm=True, auto=True)
    # far over every budget -> no kernel
    assert rk.pick_io_mode(1, 30, 1024, 1024, 128, 4, warm=True) is None
    with pytest.raises(ValueError, match="I/O variants"):
        rk._resolve_io_mode("auto", 1, 30, 1024, 1024, 128, 4, True, 2)
    with pytest.raises(ValueError, match="io_mode"):
        rk._resolve_io_mode("bogus", 5, 10, 128, 128, 64, 2, False, 2)
    # a user-forced variant that does not fit names the forced mode and the
    # one that would, instead of tracing into a 'dispatch bug' error
    with pytest.raises(ValueError,
                       match="forced io_mode='resident'.*'streamed'"):
        rk._resolve_io_mode("resident", 1, 30, 256, 256, 64, 2, True, 2)
    with pytest.raises(ValueError, match="no variant fits"):
        rk._resolve_io_mode("resident", 1, 30, 1024, 1024, 128, 4, True, 2)


def test_rollout_kernel_streamed_tpu_lowering_from_cpu_host():
    """Client-side pallas->Mosaic lowering of the streamed-I/O variant for
    platform 'tpu' from a CPU host — pins the DMA descriptor/semaphore
    lowering (HBM-sliced async copies, per-slot semaphores, staging-slot
    writes) incl. the REAL 256x256/30-frame warm serving shape. Only the
    server-side machine-code compile remains hardware-gated."""
    from jax import export as jax_export

    from pl_convlstm_gan_tpu.config import Config
    from pl_convlstm_gan_tpu.models import ConvLSTMForecaster
    from pl_convlstm_gan_tpu.ops.pallas.rollout_kernel import (
        rollout_pallas, rollout_pallas_from_state)
    from pl_convlstm_gan_tpu.streaming import StreamingForecaster

    t_in, t_out, size = 2, 3, 64
    frames = jnp.zeros((1, t_in, 1, size, size), jnp.float32)
    model = ConvLSTMForecaster(hidden_dims=(64, 64), input_frames=t_in,
                               output_frames=t_out, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), frames)
    fn = lambda p, x: rollout_pallas(p, x, t_out, jnp.bfloat16,
                                     interpret=False, io_mode="streamed")
    exp = jax_export.export(jax.jit(fn), platforms=("tpu",))(
        jax.eval_shape(lambda: params),
        jax.ShapeDtypeStruct(frames.shape, frames.dtype))
    assert len(exp.serialize()) > 0

    # the shape this variant exists for: 256x256 warm streaming, h=30
    size = 256
    cfg = Config.from_dict({
        "data": {"source": "synthetic"},
        "model": {"family": "forecaster", "hidden_dims": [64, 64],
                  "input_frames": 5, "output_frames": 30},
        "training": {"batch_size": 8},
        "output": {"output_dir": "/tmp/plcg_lowering_streamed"}})
    sf = StreamingForecaster(cfg, params)
    state = sf.init_state(1, size, size)
    wfn = lambda cs, po: rollout_pallas_from_state(
        params["params"]["core"], cs, po, 30, jnp.bfloat16,
        interpret=False, io_mode="streamed")
    exp2 = jax_export.export(jax.jit(wfn), platforms=("tpu",))(
        *jax.eval_shape(lambda: (state.cells, state.prev_out)))
    assert len(exp2.serialize()) > 0


def test_rollout_kernel_tpu_lowering_from_cpu_host():
    """The pallas->Mosaic LOWERING of the rollout kernel (cold + warm, 2- and
    3-cell) runs client-side: jax.export for platform 'tpu' from a CPU-only
    host must succeed. Pins the layout/reshape/slice lowering rules the
    kernel depends on (128-lane padded warm state, sub-tile lane slices,
    f32-routed minor-dim reshapes) without TPU hardware; only the on-device
    Mosaic machine-code compile is outside this test's reach."""
    from jax import export as jax_export

    from pl_convlstm_gan_tpu.config import Config
    from pl_convlstm_gan_tpu.models import ConvLSTMForecaster
    from pl_convlstm_gan_tpu.ops.pallas.rollout_kernel import rollout_pallas
    from pl_convlstm_gan_tpu.streaming import StreamingForecaster

    t_in, t_out, size = 2, 3, 64
    for cells in (2, 3):
        hidden = (64,) * cells
        frames = jnp.zeros((1, t_in, 1, size, size), jnp.float32)
        model = ConvLSTMForecaster(hidden_dims=hidden, input_frames=t_in,
                                   output_frames=t_out, dtype=jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(0), frames)

        # interpret=False: from a CPU host the auto mode would lower the
        # INTERPRETER emulation, silently skipping the Mosaic lowering this
        # test exists to pin
        fn = lambda p, x: rollout_pallas(p, x, t_out, jnp.bfloat16,
                                         interpret=False)
        exp = jax_export.export(jax.jit(fn), platforms=("tpu",))(
            jax.eval_shape(lambda: params),
            jax.ShapeDtypeStruct(frames.shape, frames.dtype))
        assert len(exp.serialize()) > 0

        cfg = Config.from_dict({
            "data": {"source": "synthetic"},
            "model": {"family": "forecaster", "hidden_dims": list(hidden),
                      "input_frames": t_in, "output_frames": t_out},
            "training": {"batch_size": 8},
            "output": {"output_dir": "/tmp/plcg_lowering_test"}})
        sf = StreamingForecaster(cfg, params)
        state = sf.init_state(1, size, size)
        pfn = sf.export_forecast_pallas_fn(t_out)
        exp2 = jax_export.export(jax.jit(pfn), platforms=("tpu",))(
            jax.eval_shape(lambda: (state.cells, state.prev_out)))
        assert len(exp2.serialize()) > 0
