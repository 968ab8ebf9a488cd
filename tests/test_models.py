"""Model-level tests mirroring the reference test workloads
(/root/reference/test/test_model.py:12-179) plus forecaster/discriminator coverage."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pl_convlstm_gan_tpu.models import (ConvLSTMForecaster, Discriminator, Generator,
                                        num_upsample_blocks, resolve_scale)


def _gen_inputs(rng, b=2, t=5, h=32, w=32, lu_c=5):
    rain = jnp.asarray(rng.standard_normal((b, t, 1, h, w), dtype=np.float32))
    dem = jnp.asarray(rng.standard_normal((b, 1, h, w), dtype=np.float32))
    lu = jnp.asarray(rng.standard_normal((b, lu_c, h, w), dtype=np.float32))
    return rain, dem, lu


def test_generator_basic_shape(rng):
    """Mirrors reference test_model.py:12-50: B2 T5 32x32, scale 8 -> [2,5,1,256,256]."""
    model = Generator(hidden_dims=(16, 32), lu_channels=5, scale_factor=8)
    rain, dem, lu = _gen_inputs(rng)
    params = model.init(jax.random.PRNGKey(0), rain, dem, lu)
    out = jax.jit(model.apply)(params, rain, dem, lu)
    assert out.shape == (2, 5, 1, 256, 256)
    assert np.isfinite(np.asarray(out)).all()


def test_generator_grid_size_mode(rng):
    """Mirrors reference test_model.py:53-97: target 500m, input 4000m -> 8x."""
    model = Generator(hidden_dims=(16, 32), lu_channels=5,
                      target_grid_size=(500, 500))
    rain, dem, lu = _gen_inputs(rng)
    params = model.init(jax.random.PRNGKey(0), rain, dem, lu,
                        input_grid_size=(4000, 4000))
    out = model.apply(params, rain, dem, lu, input_grid_size=(4000, 4000))
    assert out.shape == (2, 5, 1, 256, 256)


def test_generator_scale4_small(rng):
    """Mirrors reference test_model.py:150-179: B1 T3 16x16 scale 4."""
    model = Generator(hidden_dims=(16, 32), lu_channels=5, scale_factor=4)
    rain, dem, lu = _gen_inputs(rng, b=1, t=3, h=16, w=16)
    params = model.init(jax.random.PRNGKey(0), rain, dem, lu)
    out = model.apply(params, rain, dem, lu)
    assert out.shape == (1, 3, 1, 64, 64)


def test_generator_non_power_of_two_scale(rng):
    """Scale 6 = 2 blocks (x4) + bilinear remainder 1.5 (reference generator.py:73-92)."""
    model = Generator(hidden_dims=(8, 8), lu_channels=2, scale_factor=6)
    rain, dem, lu = _gen_inputs(rng, b=1, t=2, h=8, w=8, lu_c=2)
    params = model.init(jax.random.PRNGKey(0), rain, dem, lu)
    out = model.apply(params, rain, dem, lu)
    assert out.shape == (1, 2, 1, 48, 48)


def test_resolve_scale_and_blocks():
    assert resolve_scale(32, 32, 8, None, None) == (8.0, None)
    assert resolve_scale(32, 32, None, (500, 500), (4000, 4000)) == (8.0, (256, 256))
    assert num_upsample_blocks(8) == 3
    assert num_upsample_blocks(6) == 2
    assert num_upsample_blocks(1) == 0


def test_generator_hires_covariates(rng):
    """DEM/LUCC supplied at higher resolution than rain (the real Fenhe case)."""
    model = Generator(hidden_dims=(8, 8), lu_channels=3, scale_factor=4)
    b, t, h, w = 1, 2, 8, 8
    rain = jnp.asarray(rng.standard_normal((b, t, 1, h, w), dtype=np.float32))
    dem = jnp.asarray(rng.standard_normal((b, 1, 64, 48), dtype=np.float32))
    lu = jnp.asarray(rng.standard_normal((b, 3, 64, 48), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), rain, dem, lu)
    out = model.apply(params, rain, dem, lu)
    assert out.shape == (b, t, 1, 32, 32)


def test_generator_bf16_compute(rng):
    model = Generator(hidden_dims=(16, 32), lu_channels=5, scale_factor=8,
                      dtype=jnp.bfloat16)
    rain, dem, lu = _gen_inputs(rng)
    params = model.init(jax.random.PRNGKey(0), rain, dem, lu)
    # params stay f32, output cast back to f32
    leaves = jax.tree_util.tree_leaves(params)
    assert all(l.dtype == jnp.float32 for l in leaves)
    out = model.apply(params, rain, dem, lu)
    assert out.dtype == jnp.float32
    assert out.shape == (2, 5, 1, 256, 256)


def test_generator_gradients_flow(rng):
    model = Generator(hidden_dims=(8, 8), lu_channels=2, scale_factor=2)
    rain, dem, lu = _gen_inputs(rng, b=1, t=2, h=8, w=8, lu_c=2)
    params = model.init(jax.random.PRNGKey(0), rain, dem, lu)

    def loss_fn(p):
        return jnp.mean(jnp.square(model.apply(p, rain, dem, lu)))

    grads = jax.grad(loss_fn)(params)
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                         for g in jax.tree_util.tree_leaves(grads)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_forecaster_rollout_shapes(rng):
    model = ConvLSTMForecaster(hidden_dims=(8, 8), input_frames=5, output_frames=7)
    frames = jnp.asarray(rng.standard_normal((2, 5, 1, 16, 16), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), frames)
    out = jax.jit(model.apply)(params, frames)
    assert out.shape == (2, 7, 1, 16, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_forecaster_teacher_forcing_changes_output(rng):
    model = ConvLSTMForecaster(hidden_dims=(8,), input_frames=3, output_frames=4)
    frames = jnp.asarray(rng.standard_normal((2, 3, 1, 8, 8), dtype=np.float32))
    targets = jnp.asarray(rng.standard_normal((2, 4, 1, 8, 8), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), frames)
    free = model.apply(params, frames)
    forced = model.apply(params, frames, targets=targets, teacher_forcing_prob=1.0,
                         rng=jax.random.PRNGKey(1))
    # teacher forcing replaces the fed-back frames -> outputs after step 1 differ
    assert not np.allclose(np.asarray(free), np.asarray(forced))
    # prob=0 with rng must equal free rollout
    unforced = model.apply(params, frames, targets=targets, teacher_forcing_prob=0.0,
                           rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(free), np.asarray(unforced), atol=1e-6)


def test_forecaster_teacher_input_alignment(rng):
    """With tf_prob=1, prediction k must NEVER see its own label targets[k] —
    only strictly earlier target frames (ADVICE.md round-1 high finding: an
    off-by-one fed each step its own label, an identity shortcut)."""
    t_in, t_out = 3, 4
    model = ConvLSTMForecaster(hidden_dims=(8,), input_frames=t_in,
                               output_frames=t_out)
    frames = jnp.asarray(rng.standard_normal((1, t_in, 1, 8, 8), dtype=np.float32))
    targets = jnp.asarray(rng.standard_normal((1, t_out, 1, 8, 8), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), frames)

    def pred_k(tgt, k):
        out = model.apply(params, frames, targets=tgt, teacher_forcing_prob=1.0,
                          rng=jax.random.PRNGKey(1))
        return jnp.sum(out[:, k])

    for k in range(t_out):
        g = jax.grad(pred_k)(targets, k)
        g = np.asarray(g)
        per_frame = np.abs(g).reshape(t_out, -1).sum(axis=1)
        # no dependence on the frame being predicted, or any later frame
        assert per_frame[k:].sum() == 0.0, (k, per_frame)
        if k > 0:
            # teacher forcing at prob=1 must feed target[k-1] into step k
            assert per_frame[k - 1] > 0.0, (k, per_frame)


def test_discriminator_shapes(rng):
    model = Discriminator(features=(8, 16))
    frames = jnp.asarray(rng.standard_normal((2, 5, 1, 64, 64), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), frames)
    logits = model.apply(params, frames)
    assert logits.shape[0] == 2 and logits.shape[1] == 5 and logits.shape[2] == 1
    # two stride-2 convs: 64 -> 16 spatial, then -1 from the VALID-ish 4x4 pad-1 head
    assert logits.shape[3] == logits.shape[4] == 15


def test_forecaster_remat_matches(rng):
    """remat=True must be numerically identical (it only changes memory)."""
    frames = jnp.asarray(rng.standard_normal((1, 3, 1, 8, 8), dtype=np.float32))
    m1 = ConvLSTMForecaster(hidden_dims=(8,), input_frames=3, output_frames=4)
    m2 = ConvLSTMForecaster(hidden_dims=(8,), input_frames=3, output_frames=4,
                            remat=True)
    params = m1.init(jax.random.PRNGKey(0), frames)
    o1 = m1.apply(params, frames)
    o2 = m2.apply(params, frames)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)

    # gradients flow through the rematerialized scan
    g = jax.grad(lambda p: jnp.square(m2.apply(p, frames)).mean())(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


def test_generator_three_cells(rng):
    """Generator generalizes to N stacked cells (reference hardwires 2)."""
    model = Generator(hidden_dims=(8, 8, 16), lu_channels=2, scale_factor=2)
    rain, dem, lu = _gen_inputs(rng, b=1, t=2, h=8, w=8, lu_c=2)
    params = model.init(jax.random.PRNGKey(0), rain, dem, lu)
    assert "cell3" in params["params"]["recurrence"]
    out = model.apply(params, rain, dem, lu)
    assert out.shape == (1, 2, 1, 16, 16)


def test_generator_split_precompute_equivalent(rng):
    """split_precompute=True (cell1 x-side conv hoisted out of the scan as one
    merged (T*B) conv) must be numerically equivalent on the SAME params, with
    an identical param tree (checkpoint-interchangeable schedules)."""
    b, t, h, w, lu_c = 2, 3, 8, 8, 4
    rain = jnp.asarray(rng.standard_normal((b, t, 1, h, w), dtype=np.float32))
    dem = jnp.asarray(rng.standard_normal((b, 1, h, w), dtype=np.float32))
    lu = jnp.asarray(rng.standard_normal((b, lu_c, h, w), dtype=np.float32))

    g0 = Generator(hidden_dims=(8, 8, 16), lu_channels=lu_c, scale_factor=2)
    g1 = Generator(hidden_dims=(8, 8, 16), lu_channels=lu_c, scale_factor=2,
                   split_precompute=True)
    p0 = g0.init(jax.random.PRNGKey(0), rain, dem, lu)
    p1 = g1.init(jax.random.PRNGKey(0), rain, dem, lu)
    assert (jax.tree_util.tree_structure(p0)
            == jax.tree_util.tree_structure(p1))
    o0 = g0.apply(p0, rain, dem, lu)
    o1 = g1.apply(p0, rain, dem, lu)   # same params, split schedule
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-5)

    # gradients flow through the split schedule
    g = jax.grad(lambda p: jnp.square(g1.apply(p, rain, dem, lu)).mean())(p0)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


def test_forecaster_scan_unroll_equivalent(rng):
    """scan_unroll only changes the compiled loop structure, never the math."""
    frames = jnp.asarray(rng.standard_normal((1, 3, 1, 8, 8), dtype=np.float32))
    m1 = ConvLSTMForecaster(hidden_dims=(8,), input_frames=3, output_frames=4)
    m2 = ConvLSTMForecaster(hidden_dims=(8,), input_frames=3, output_frames=4,
                            scan_unroll=2)
    params = m1.init(jax.random.PRNGKey(0), frames)
    o1 = m1.apply(params, frames)
    o2 = m2.apply(params, frames)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_forecaster_split_transpose_equivalent(rng):
    """scan_split_transpose restructures only the AD-transposed scan; forward
    AND gradients must be unchanged (measured perf-neutral on TPU —
    experiments/split_transpose_bench.py)."""
    frames = jnp.asarray(rng.standard_normal((1, 3, 1, 8, 8), dtype=np.float32))
    tgt = jnp.asarray(rng.standard_normal((1, 4, 1, 8, 8), dtype=np.float32))
    m1 = ConvLSTMForecaster(hidden_dims=(8,), input_frames=3, output_frames=4)
    m2 = ConvLSTMForecaster(hidden_dims=(8,), input_frames=3, output_frames=4,
                            scan_split_transpose=True)
    params = m1.init(jax.random.PRNGKey(0), frames)
    np.testing.assert_allclose(np.asarray(m1.apply(params, frames)),
                               np.asarray(m2.apply(params, frames)), atol=1e-6)
    loss = lambda m: (lambda p: jnp.abs(m.apply(p, frames) - tgt).mean())
    g1 = jax.grad(loss(m1))(params)
    g2 = jax.grad(loss(m2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("policy", ["", "save_z", "dots"])
def test_forecaster_remat_policy_equivalent(rng, policy):
    """Selective remat policies (save-only-conv-preactivations, dots_saveable)
    change only WHAT the backward stores vs recomputes; forward and gradients
    must match the no-remat model exactly."""
    frames = jnp.asarray(rng.standard_normal((1, 3, 1, 8, 8), dtype=np.float32))
    tgt = jnp.asarray(rng.standard_normal((1, 4, 1, 8, 8), dtype=np.float32))
    m1 = ConvLSTMForecaster(hidden_dims=(8,), input_frames=3, output_frames=4)
    m2 = ConvLSTMForecaster(hidden_dims=(8,), input_frames=3, output_frames=4,
                            remat=True, remat_policy=policy)
    params = m1.init(jax.random.PRNGKey(0), frames)
    np.testing.assert_allclose(np.asarray(m1.apply(params, frames)),
                               np.asarray(m2.apply(params, frames)), atol=1e-6)
    loss = lambda m: (lambda p: jnp.abs(m.apply(p, frames) - tgt).mean())
    g1 = jax.grad(loss(m1))(params)
    g2 = jax.grad(loss(m2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
