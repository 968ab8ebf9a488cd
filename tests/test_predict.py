"""Inference API: load_predictor restores a checkpoint and reproduces the
trainer's model outputs (the deployment path the reference never had)."""
import numpy as np
import jax.numpy as jnp

from pl_convlstm_gan_tpu.config import Config
from pl_convlstm_gan_tpu.predict import build_model, load_predictor
from pl_convlstm_gan_tpu.train import SequenceTrainer, Trainer


def test_predictor_forecaster_roundtrip(tmp_path, rng):
    cfg = Config.from_dict({
        "data": {"source": "synthetic", "synthetic_num_sequences": 48,
                 "synthetic_image_size": 8},
        "model": {"family": "forecaster", "hidden_dims": [8],
                  "input_frames": 2, "output_frames": 3},
        "training": {"batch_size": 8, "epochs": 1, "learning_rate": 1e-3,
                     "use_split": True, "use_early_stopping": False},
        "output": {"output_dir": str(tmp_path / "out"), "log_interval": 100},
    })
    t = SequenceTrainer(config=cfg)
    t.train()

    predict = load_predictor(cfg, str(tmp_path / "out" / "best_model"))
    frames = jnp.asarray(rng.random((2, 2, 1, 8, 8)).astype(np.float32))
    out = predict(frames)
    assert out.shape == (2, 3, 1, 8, 8)
    # must equal applying the trainer's current (best=final here) params
    expect = t.model.apply(t.state.params, frames)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-5)

    # serve a LONGER horizon than trained (recurrent params are
    # horizon-independent); the trained prefix of the rollout is identical
    predict7 = load_predictor(cfg, str(tmp_path / "out" / "best_model"),
                              output_frames=7)
    out7 = predict7(frames)
    assert out7.shape == (2, 7, 1, 8, 8)
    np.testing.assert_allclose(np.asarray(out7[:, :3]), np.asarray(out),
                               atol=1e-5)


def test_predictor_data_parallel(tmp_path, rng):
    """Batch-sharded inference over the 8 virtual devices == single-device
    predict exactly; 'require' raises on an unsplittable batch instead of
    silently serving on one chip; non-divisible batches fall back."""
    import jax
    import pytest

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
    n = jax.device_count()
    assert n == 8   # tests/conftest.py virtual mesh

    single = load_predictor(cfg, ckpt, data_parallel="off")
    dp = load_predictor(cfg, ckpt)                       # auto
    frames = jnp.asarray(rng.random((8, 2, 1, 8, 8)).astype(np.float32))
    out_dp = dp(frames)
    # the output really is batch-sharded over the mesh
    assert len(out_dp.sharding.device_set) == n
    np.testing.assert_allclose(np.asarray(out_dp),
                               np.asarray(single(frames)), atol=1e-6)

    # non-divisible batch: auto falls back (single-device placement), exact
    frames3 = frames[:3]
    np.testing.assert_allclose(np.asarray(dp(frames3)),
                               np.asarray(single(frames3)), atol=1e-6)

    req = load_predictor(cfg, ckpt, data_parallel="require")
    np.testing.assert_allclose(np.asarray(req(frames)),
                               np.asarray(out_dp), atol=1e-6)
    with pytest.raises(ValueError, match="not divisible"):
        req(frames3)
    with pytest.raises(ValueError, match="data_parallel"):
        load_predictor(cfg, ckpt, data_parallel="bogus")


def test_predictor_data_parallel_pallas_rollout(tmp_path, rng):
    """DP predict composes with the Pallas rollout kernel: Mosaic custom
    calls cannot be GSPMD-auto-partitioned (bare jit with sharded inputs
    raises NotImplementedError at lowering), so the DP wrapper runs the
    predict program under shard_map — each device executes the whole kernel
    on its local batch shard. Pinned here on the 8-device mesh in interpret
    mode with rollout_impl='pallas' forcing the kernel branch."""
    import jax

    from pl_convlstm_gan_tpu.predict import build_model
    from pl_convlstm_gan_tpu.train.checkpoint import save_checkpoint

    cfg = Config.from_dict({
        "data": {"source": "synthetic"},
        "model": {"family": "forecaster", "hidden_dims": [64, 64],
                  "input_frames": 2, "output_frames": 3,
                  "rollout_impl": "pallas"},
        "training": {"batch_size": 8},
        "output": {"output_dir": str(tmp_path / "out")},
    })
    model = build_model(cfg)
    frames = jnp.asarray(rng.random((8, 2, 1, 8, 8)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), frames)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, {"params": params}, {"epoch": 0, "rmse": 1.0})

    single = load_predictor(cfg, ckpt, data_parallel="off")
    dp = load_predictor(cfg, ckpt, data_parallel="require")
    out = dp(frames)
    assert len(out.sharding.device_set) == jax.device_count()
    np.testing.assert_allclose(np.asarray(out), np.asarray(single(frames)),
                               atol=1e-5, rtol=1e-5)


def test_predictor_generator(tmp_path, rng):
    cfg = Config.from_dict({
        "data": {"source": "synthetic", "synthetic_num_sequences": 48,
                 "synthetic_image_size": 8, "synthetic_num_stations": 4},
        "model": {"family": "generator", "hidden_dims": [8, 8], "T": 3,
                  "scale_factor": 2},
        "training": {"batch_size": 8, "epochs": 1, "learning_rate": 1e-3,
                     "use_split": True, "split_method": "random",
                     "use_early_stopping": False},
        "output": {"output_dir": str(tmp_path / "outg"), "log_interval": 100},
    })
    t = Trainer(config=cfg)
    t.train()
    ds = t.train_dataset
    lu_c = ds.dataset.num_lu_classes if hasattr(ds, "dataset") else ds.num_lu_classes
    predict = load_predictor(cfg, str(tmp_path / "outg" / "best_model"),
                             lu_channels=lu_c)
    rain = jnp.asarray(rng.random((1, 3, 1, 8, 8)).astype(np.float32))
    dem = jnp.asarray(rng.random((1, 1, 16, 16)).astype(np.float32))
    lu = jnp.asarray(rng.random((1, lu_c, 16, 16)).astype(np.float32))
    out = predict(rain, dem, lu)
    assert out.shape == (1, 3, 1, 16, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_predictor_pallas_rollout_selectable(tmp_path, rng):
    """model.rollout_impl 'pallas' routes predict through the multi-step
    VMEM-resident rollout kernel with outputs matching the XLA rollout
    (interpret mode on CPU)."""
    cfg = Config.from_dict({
        "data": {"source": "synthetic", "synthetic_num_sequences": 16,
                 "synthetic_image_size": 8},
        "model": {"family": "forecaster", "hidden_dims": [64, 64],
                  "input_frames": 2, "output_frames": 2},
        "training": {"batch_size": 8, "epochs": 1, "learning_rate": 1e-3,
                     "use_split": False, "use_early_stopping": False},
        "output": {"output_dir": str(tmp_path / "outp"), "log_interval": 100},
    })
    t = SequenceTrainer(config=cfg)
    t.train()
    ckpt = str(tmp_path / "outp" / "best_model")
    frames = jnp.asarray(rng.random((1, 2, 1, 8, 8)).astype(np.float32))
    ref = load_predictor(cfg, ckpt)(frames)
    cfg.model.rollout_impl = "pallas"
    out = load_predictor(cfg, ckpt)(frames)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # wrong-length windows are rejected on the kernel path too — the model's
    # input_frames contract must not be backend-dependent
    import pytest
    bad = jnp.asarray(rng.random((1, 3, 1, 8, 8)).astype(np.float32))
    with pytest.raises(ValueError, match="input window"):
        load_predictor(cfg, ckpt)(bad)
