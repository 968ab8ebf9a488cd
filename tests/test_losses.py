"""Loss parity + property tests, mirroring the reference loss test strategy
(/root/reference/test/test_loss_fix.py): component composition via allclose,
conservation on the real grid shape, vectorized point loss with 35 stations,
smoothness ordering property — plus torch-parity checks and GAN/SSIM coverage."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pl_convlstm_gan_tpu.losses import (
    CombinedLoss, combined_loss, compute_sample_weights, conservation_loss,
    gradient_loss, point_supervision_loss, station_rmse, temporal_consistency_loss,
    bce_with_logits, discriminator_loss, gan_generator_loss, ssim,
)


def test_default_lambdas_match_reference():
    """Reference defaults: 1.0/1.0/0.1/0.05 (combined_loss.py:7)."""
    m = CombinedLoss()
    assert (m.lambda_point, m.lambda_conserve, m.lambda_smooth, m.lambda_temporal) \
        == (1.0, 1.0, 0.1, 0.05)


def test_total_is_weighted_sum(rng):
    """Mirrors test_loss_fix.py:141-187: total == sum of lambda * component."""
    pred = jnp.asarray(rng.standard_normal((2, 5, 1, 64, 64), dtype=np.float32))
    lr = jnp.asarray(rng.standard_normal((2, 5, 1, 8, 8), dtype=np.float32))
    coords = jnp.asarray(rng.integers(0, 8, (5, 2)))
    vals = jnp.abs(jnp.asarray(rng.standard_normal((2, 5, 5), dtype=np.float32)))
    total, d = combined_loss(pred, lr, coords, vals, scale_factor=8.0,
                             lambda_point=0.3, lambda_conserve=0.7,
                             lambda_smooth=0.2, lambda_temporal=0.1)
    expect = 0.3 * d["point"] + 0.7 * d["conserve"] + 0.2 * d["smooth"] \
        + 0.1 * d["temporal"]
    np.testing.assert_allclose(float(total), float(expect), rtol=1e-6)


def test_conservation_matches_torch(rng):
    """Area-downscale parity incl. the reference grid 120x96 -> 15x12
    (test_loss_fix.py:38-67)."""
    pred = rng.standard_normal((2, 5, 1, 120, 96), dtype=np.float32)
    lr = rng.standard_normal((2, 5, 1, 15, 12), dtype=np.float32)
    ours = conservation_loss(jnp.asarray(pred), jnp.asarray(lr))
    b, t = 2, 5
    pt = torch.from_numpy(pred).view(b * t, 1, 120, 96)
    down = F.interpolate(pt, size=(15, 12), mode="area").view(b, t, 1, 15, 12)
    theirs = (down - torch.from_numpy(lr)).abs().mean()
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)
    assert float(ours) >= 0


def test_point_loss_matches_torch_reference_math(rng):
    """Vectorized station loss vs an inline torch computation of the reference
    semantics (combined_loss.py:79-141), 35 stations (test_loss_fix.py:70-107)."""
    b, t, h_lr, w_lr, s = 2, 5, 15, 12, 35
    scale = 8.0
    h, w = int(h_lr * scale), int(w_lr * scale)
    pred = rng.standard_normal((b, t, 1, h, w), dtype=np.float32)
    coords = rng.integers(0, min(h_lr, w_lr), (s, 2))
    vals = np.abs(rng.standard_normal((b, t, s), dtype=np.float32)) * 30
    vals[0, 0, 0] = np.nan  # NaN obs must be masked (combined_loss.py:125)

    ours = point_supervision_loss(jnp.asarray(pred), jnp.asarray(coords),
                                  jnp.asarray(vals), scale, True, "log")

    # torch mirror of the reference math
    pt = torch.from_numpy(pred)[:, :, 0]
    c = torch.from_numpy(coords)
    scaled = ((c.float() + 0.5) * scale - 0.5).long()
    rows, cols = scaled[:, 0], scaled[:, 1]
    valid = (rows >= 0) & (rows < h) & (cols >= 0) & (cols < w)
    vr, vc = rows[valid], cols[valid]
    n = vr.shape[0]
    bi = torch.arange(b).view(b, 1, 1).expand(b, t, n)
    ti = torch.arange(t).view(1, t, 1).expand(b, t, n)
    pa = pt[bi, ti, vr.view(1, 1, -1).expand(b, t, n), vc.view(1, 1, -1).expand(b, t, n)]
    obs = torch.from_numpy(vals)[:, :, valid]
    m = ~torch.isnan(obs)
    wts = 1.0 + torch.log1p(obs[m])
    theirs = (F.l1_loss(pa[m], obs[m], reduction="none") * wts).mean()
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def test_station_index_trunc_matches_torch_long(rng):
    """Downscaling (scale < 1): coord 0 scales to -0.3, which torch .long()
    truncates to 0 (station KEPT) — floor would give -1 (station dropped).
    Pins the truncation-toward-zero semantics (ADVICE.md round-1 finding)."""
    from pl_convlstm_gan_tpu.losses.combined import _station_pixel_indices
    coords = jnp.asarray(np.array([[0, 0], [2, 3]]))
    scale = 0.4  # (0 + 0.5) * 0.4 - 0.5 = -0.3
    rows, cols, valid = _station_pixel_indices(coords, scale, 8, 8)
    torch_scaled = ((torch.tensor(np.asarray(coords)).float() + 0.5)
                    * scale - 0.5).long()
    np.testing.assert_array_equal(np.asarray(rows), torch_scaled[:, 0].numpy())
    np.testing.assert_array_equal(np.asarray(cols), torch_scaled[:, 1].numpy())
    assert bool(valid[0]), "slightly-negative scaled coord must stay valid"


def test_point_loss_out_of_bounds_and_empty(rng):
    pred = jnp.asarray(rng.standard_normal((1, 2, 1, 16, 16), dtype=np.float32))
    # station scaled out of bounds at scale 1 on a 16x16 grid
    coords = jnp.asarray(np.array([[100, 100]]))
    vals = jnp.asarray(rng.standard_normal((1, 2, 1), dtype=np.float32))
    out = point_supervision_loss(pred, coords, vals, 1.0)
    assert float(out) == 0.0
    # all-NaN observations
    vals_nan = jnp.full((1, 2, 1), jnp.nan)
    coords_ok = jnp.asarray(np.array([[3, 3]]))
    assert float(point_supervision_loss(pred, coords_ok, vals_nan, 1.0)) == 0.0


def test_smoothness_ordering_property(rng):
    """gradient_loss(constant) < gradient_loss(noise) (test_loss_fix.py:110-138)."""
    const = jnp.ones((1, 2, 1, 32, 32))
    noise = jnp.asarray(rng.standard_normal((1, 2, 1, 32, 32), dtype=np.float32))
    assert float(gradient_loss(const)) < float(gradient_loss(noise))
    assert float(gradient_loss(const)) == 0.0


def test_temporal_loss_zero_for_static_sequence(rng):
    frame = rng.standard_normal((1, 1, 1, 8, 8), dtype=np.float32)
    seq = jnp.asarray(np.repeat(frame, 5, axis=1))
    assert float(temporal_consistency_loss(seq)) == 0.0


def test_weight_strategies(rng):
    r = jnp.asarray([0.0, 5.0, 15.0, 30.0, 60.0])
    np.testing.assert_allclose(np.asarray(compute_sample_weights(r, True, "log")),
                               1 + np.log1p(np.asarray(r)), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(compute_sample_weights(r, True, "stratified")),
                                  [1.0, 1.0, 2.0, 3.0, 5.0])
    np.testing.assert_allclose(np.asarray(compute_sample_weights(r, True, "sqrt")),
                               1 + np.sqrt(np.asarray(r)), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(compute_sample_weights(r, False, "log")),
                                  np.ones(5))


def test_station_rmse_matches_manual(rng):
    b, t, h, w = 2, 3, 32, 32
    pred = rng.standard_normal((b, t, 1, h, w), dtype=np.float32)
    coords = np.array([[4, 5], [10, 2]])
    vals = rng.standard_normal((b, t, 2), dtype=np.float32)
    out = station_rmse(jnp.asarray(pred), jnp.asarray(coords), jnp.asarray(vals), 1.0)
    # scale 1: scaled coord = floor(c + 0.5 - 0.5) = c
    pa = pred[:, :, 0][:, :, coords[:, 0], coords[:, 1]]
    expect = np.sqrt(np.mean((pa - vals) ** 2))
    np.testing.assert_allclose(float(out), expect, rtol=1e-5)


def test_loss_is_jittable_and_differentiable(rng):
    pred = jnp.asarray(rng.standard_normal((1, 3, 1, 32, 32), dtype=np.float32))
    lr = jnp.asarray(rng.standard_normal((1, 3, 1, 8, 8), dtype=np.float32))
    coords = jnp.asarray(rng.integers(0, 8, (4, 2)))
    vals = jnp.abs(jnp.asarray(rng.standard_normal((1, 3, 4), dtype=np.float32)))

    @jax.jit
    def f(p):
        total, _ = combined_loss(p, lr, coords, vals, 4.0)
        return total

    g = jax.grad(f)(pred)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


# ---------------- adversarial + ssim ----------------

def test_bce_matches_torch(rng):
    logits = rng.standard_normal((4, 7), dtype=np.float32)
    targets = (rng.random((4, 7)) > 0.5).astype(np.float32)
    ours = bce_with_logits(jnp.asarray(logits), jnp.asarray(targets))
    theirs = F.binary_cross_entropy_with_logits(torch.from_numpy(logits),
                                                torch.from_numpy(targets))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def test_discriminator_loss_behaviour(rng):
    # perfect D: large positive real logits, large negative fake logits -> loss ~ 0
    good, _ = discriminator_loss(jnp.full((2, 4), 20.0), jnp.full((2, 4), -20.0))
    bad, _ = discriminator_loss(jnp.full((2, 4), -20.0), jnp.full((2, 4), 20.0))
    assert float(good) < 1e-6 < float(bad)


def test_gan_generator_loss_components(rng):
    pred = jnp.asarray(rng.standard_normal((2, 3, 1, 8, 8), dtype=np.float32))
    tgt = jnp.asarray(rng.standard_normal((2, 3, 1, 8, 8), dtype=np.float32))
    logits = jnp.asarray(rng.standard_normal((2, 3, 1, 2, 2), dtype=np.float32))
    total, d = gan_generator_loss(logits, pred, tgt, lambda_adv=0.5, lambda_l1=2.0)
    np.testing.assert_allclose(float(total),
                               0.5 * float(d["g_adv"]) + 2.0 * float(d["g_l1"]),
                               rtol=1e-6)


def test_ssim_identity_and_range(rng):
    x = rng.random((2, 3, 1, 32, 32)).astype(np.float32)
    assert float(ssim(jnp.asarray(x), jnp.asarray(x))) == pytest.approx(1.0, abs=1e-5)
    y = rng.random((2, 3, 1, 32, 32)).astype(np.float32)
    val = float(ssim(jnp.asarray(x), jnp.asarray(y)))
    assert -1.0 <= val < 1.0
    # more similar pair scores higher
    close = x + 0.01 * y
    assert float(ssim(jnp.asarray(x), jnp.asarray(close))) > val


def test_nowcast_categorical_scores():
    from pl_convlstm_gan_tpu.losses import categorical_scores, nowcast_scores
    pred = jnp.asarray([[1.0, 0.0], [1.0, 1.0]])
    tgt = jnp.asarray([[1.0, 1.0], [0.0, 1.0]])
    # threshold 0.5: hits=2 (0,0),(1,1); miss=1 (0,1); fa=1 (1,0); cn=0
    s = categorical_scores(pred, tgt, 0.5)
    assert float(s["pod"]) == pytest.approx(2 / 3)
    assert float(s["far"]) == pytest.approx(1 / 3)
    assert float(s["csi"]) == pytest.approx(0.5)
    # perfect forecast
    sp = categorical_scores(tgt, tgt, 0.5)
    assert float(sp["pod"]) == 1.0 and float(sp["far"]) == 0.0
    assert float(sp["csi"]) == 1.0 and float(sp["hss"]) == pytest.approx(1.0)
    flat = nowcast_scores(pred, tgt, thresholds=(0.5, 2.0))
    assert set(k.split("@")[0] for k in flat) == {"pod", "far", "csi", "hss"}
    assert len(flat) == 8


def test_discriminator_label_smoothing():
    logits = jnp.full((2, 4), 3.0)
    plain, _ = discriminator_loss(logits, -logits)
    smoothed, _ = discriminator_loss(logits, -logits, label_smoothing=0.1)
    # smoothing penalizes overconfident real predictions -> higher loss here
    assert float(smoothed) > float(plain)


def test_ssim_finite_with_large_offsets():
    """Large-offset near-constant signals must not drive SSIM to inf via
    negative computed variance (f32 cancellation in E[X^2]-E[X]^2; observed as
    val_ssim=inf on an early-training 256px GAN rollout)."""
    from pl_convlstm_gan_tpu.losses import ssim_per_sample
    x = jnp.full((2, 3, 1, 64, 64), 350.0, jnp.float32)
    val = ssim(x, x)
    assert np.isfinite(float(val))
    assert float(val) == pytest.approx(1.0, abs=1e-3)
    # mild noise around the big offset: finite, in [-1, 1]-ish range
    y = x + jnp.asarray(
        np.random.default_rng(0).standard_normal(x.shape).astype(np.float32))
    v2 = ssim_per_sample(x, y)
    assert np.isfinite(np.asarray(v2)).all()
    assert (np.abs(np.asarray(v2)) <= 1.5).all()


def test_ssim_frames_smaller_than_window():
    """Frames below the 11x11 window (e.g. 8x8 coarse tiles) must clamp the
    window instead of tracing a negative VALID output dim."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((2, 3, 1, 8, 8)).astype(np.float32))
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)
    y = jnp.asarray(rng.random((2, 3, 1, 8, 8)).astype(np.float32))
    v = float(ssim(x, y))
    assert np.isfinite(v) and -1.0 <= v <= 1.0


def test_ssim_bounded_under_covariance_cancellation():
    """The covariance term suffers the same f32 cancellation as the variances:
    offset 350 + texture of amplitude ~1e-3 makes the clamped variances ~0
    while the raw covariance carries error ~1e-2 >> c2, blowing SSIM to ~20
    without the Cauchy-Schwarz bound |cov| <= sqrt(var_p * var_t)."""
    rng = np.random.default_rng(1)
    t = 350.0 + 1e-3 * rng.standard_normal((1, 1, 1, 64, 64)).astype(np.float32)
    p = np.full_like(t, 350.0)
    v = float(ssim(jnp.asarray(p), jnp.asarray(t)))
    assert np.isfinite(v)
    assert -1.0 - 1e-4 <= v <= 1.0 + 1e-4


def test_ssim_gradient_finite_on_constant_windows():
    """sqrt's derivative is infinite at zero variance; the double-where guard
    must keep gradients finite on blank/constant frames (ubiquitous in
    nowcasting) so ssim is safe as a training-loss term."""
    pred = jnp.zeros((1, 16, 16))
    tgt = jnp.zeros((1, 16, 16))
    g = jax.grad(lambda p: ssim(p, tgt))(pred)
    assert np.isfinite(np.asarray(g)).all()
    # and on half-constant images (mixed zero/nonzero-variance windows)
    tgt2 = jnp.asarray(np.pad(np.ones((1, 8, 16), np.float32),
                              ((0, 0), (0, 8), (0, 0))))
    g2 = jax.grad(lambda p: ssim(p, tgt2))(pred)
    assert np.isfinite(np.asarray(g2)).all()


def test_sharpness_metrics_order_blur():
    """Property: blurring reduces both the high-frequency power fraction and
    the mean gradient magnitude — the sharpness metrics must rank
    sharp > blurred (losses/sharpness.py; GAN-quality instrumentation)."""
    import numpy as np
    from pl_convlstm_gan_tpu.losses.sharpness import (grad_mag_mean,
                                                      hf_energy_fraction)
    rng = np.random.default_rng(0)
    sharp = rng.random((2, 3, 1, 16, 16)).astype(np.float32)
    # 3x3 box blur, same shape (edge-padded)
    p = np.pad(sharp, ((0, 0), (0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
    blurred = sum(p[..., i:i + 16, j:j + 16]
                  for i in range(3) for j in range(3)) / 9.0
    hf_s, hf_b = hf_energy_fraction(jnp.asarray(sharp)), \
        hf_energy_fraction(jnp.asarray(blurred))
    gm_s, gm_b = grad_mag_mean(jnp.asarray(sharp)), \
        grad_mag_mean(jnp.asarray(blurred))
    assert np.all(np.asarray(hf_s) > np.asarray(hf_b))
    assert np.all(np.asarray(gm_s) > np.asarray(gm_b))
    assert np.all(np.asarray(hf_s) <= 1.0) and np.all(np.asarray(hf_b) >= 0.0)


def test_sharpness_ratio_in_eval_aggregation():
    """eval step with sharpness=True emits sums that aggregate to pred/target
    ratios; identical pred==target gives ratio 1.0 exactly."""
    import numpy as np
    from pl_convlstm_gan_tpu.train.steps import (aggregate_sequence_eval,
                                                 make_forecaster_eval_step)
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.random((4, 2, 1, 8, 8)).astype(np.float32))
    tgt = jnp.asarray(rng.random((4, 3, 1, 8, 8)).astype(np.float32))

    # identity "model": predict the target itself -> all ratios exactly 1
    ev = make_forecaster_eval_step(lambda p, x: tgt, sharpness=True)
    out = aggregate_sequence_eval([ev({}, (frames, tgt), jnp.asarray(4))])
    assert out["sharp_hf_ratio"] == pytest.approx(1.0, abs=1e-6)
    assert out["sharp_gm_ratio"] == pytest.approx(1.0, abs=1e-6)

    # a blurrier "prediction" scores < 1 on both
    blur = jnp.asarray(np.repeat(np.repeat(
        np.asarray(tgt)[..., ::2, ::2], 2, axis=-1), 2, axis=-2))
    ev2 = make_forecaster_eval_step(lambda p, x: blur, sharpness=True)
    out2 = aggregate_sequence_eval([ev2({}, (frames, tgt), jnp.asarray(4))])
    assert out2["sharp_hf_ratio"] < 1.0
    assert out2["sharp_gm_ratio"] < 1.0
