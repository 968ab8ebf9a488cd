"""THE parity test: run the actual reference PyTorch Generator (imported read-only
from /root/reference) and our TPU-native Generator on the same inputs with the SAME
weights (transferred via tools/import_torch_checkpoint), and compare per-frame
outputs to tolerance — the BASELINE.json north-star correctness bar, on the
reference's own code and its test_model.py workloads.

Skipped automatically when the reference checkout is not present."""
import os
import sys

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_ROOT, "src")),
    reason="reference checkout not available")


def _import_reference_generator():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from src.models.generator import Generator as TorchGenerator  # noqa
    return TorchGenerator


@pytest.mark.parametrize("case", [
    # (B, T, H, W, lu_c, scale) — mirrors reference test_model.py:12-50 and :150-179
    (2, 5, 32, 32, 5, 8),
    (1, 3, 16, 16, 5, 4),
])
def test_generator_matches_reference_with_transferred_weights(case):
    import torch
    import jax.numpy as jnp
    from pl_convlstm_gan_tpu.models import Generator
    from pl_convlstm_gan_tpu.tools.import_torch_checkpoint import convert_state_dict

    b, t, h, w, lu_c, scale = case
    TorchGenerator = _import_reference_generator()

    torch.manual_seed(0)
    ref = TorchGenerator(hidden_dims=[16, 32], lu_channels=lu_c,
                         scale_factor=scale)

    rng = np.random.default_rng(42)
    rain = rng.standard_normal((b, t, 1, h, w)).astype(np.float32)
    dem = rng.standard_normal((b, 1, h, w)).astype(np.float32)
    lu = rng.standard_normal((b, lu_c, h, w)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(rain), torch.from_numpy(dem),
                      torch.from_numpy(lu)).numpy()

    # transfer the reference's (lazily initialized) weights into our model
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_state_dict(sd)

    ours = Generator(hidden_dims=(16, 32), lu_channels=lu_c, scale_factor=scale)
    out = np.asarray(ours.apply(
        {"params": params["params"]}, jnp.asarray(rain), jnp.asarray(dem),
        jnp.asarray(lu)))

    assert out.shape == ref_out.shape == (b, t, 1, h * scale, w * scale)
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=1e-4)


def test_loss_matches_reference(rng):
    """CombinedLoss total + components vs the reference's own loss module
    (test_model.py:100-147 workload)."""
    import torch
    import jax.numpy as jnp
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from src.losses.combined_loss import CombinedLoss as TorchCombinedLoss  # noqa
    from pl_convlstm_gan_tpu.losses import combined_loss

    b, t, h_lr, w_lr = 2, 5, 32, 32
    scale = 8.0
    h, w = 256, 256
    pred = rng.standard_normal((b, t, 1, h, w), dtype=np.float32)
    lr = rng.standard_normal((b, t, 1, h_lr, w_lr), dtype=np.float32)
    coords = rng.integers(0, min(h_lr, w_lr), (b, 5, 2))
    vals = np.abs(rng.standard_normal((b, t, 5), dtype=np.float32)) * 20

    ref_loss = TorchCombinedLoss(lambda_point=0.1, lambda_conserve=1.0)
    with torch.no_grad():
        ref_total, ref_parts = ref_loss(
            torch.from_numpy(pred), torch.from_numpy(lr),
            torch.from_numpy(coords), torch.from_numpy(vals), scale)

    total, parts = combined_loss(jnp.asarray(pred), jnp.asarray(lr),
                                 jnp.asarray(coords), jnp.asarray(vals), scale,
                                 lambda_point=0.1, lambda_conserve=1.0)
    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-4)
    for k in ("point", "conserve", "smooth", "temporal"):
        np.testing.assert_allclose(float(parts[k]), float(ref_parts[k]),
                                   rtol=1e-4, err_msg=k)


def test_grid_size_mode_matches_reference(rng):
    """The target_grid_size/input_grid_size sizing path vs the reference
    (test_model.py:53-97 workload), weights transferred."""
    import torch
    import jax.numpy as jnp
    from pl_convlstm_gan_tpu.models import Generator
    from pl_convlstm_gan_tpu.tools.import_torch_checkpoint import convert_state_dict

    TorchGenerator = _import_reference_generator()
    torch.manual_seed(1)
    ref = TorchGenerator(hidden_dims=[16, 32], lu_channels=5,
                         target_grid_size=(500, 500))
    b, t, h, w = 1, 3, 16, 16
    rain = rng.standard_normal((b, t, 1, h, w)).astype(np.float32)
    dem = rng.standard_normal((b, 1, h, w)).astype(np.float32)
    lu = rng.standard_normal((b, 5, h, w)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(rain), torch.from_numpy(dem),
                      torch.from_numpy(lu),
                      input_grid_size=(4000, 4000)).numpy()
    params = convert_state_dict({k: v.numpy() for k, v in ref.state_dict().items()})
    ours = Generator(hidden_dims=(16, 32), lu_channels=5,
                     target_grid_size=(500, 500))
    out = np.asarray(ours.apply(params, jnp.asarray(rain), jnp.asarray(dem),
                                jnp.asarray(lu), input_grid_size=(4000, 4000)))
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=1e-4)


def test_asymmetric_grid_size_mode_matches_reference(rng):
    """scale_h != scale_w: the reference takes max(scale_h, scale_w) for the
    upsample-block count and then exact-resizes to the asymmetric target
    (generator.py:106-126) — pin that case too (round-1 only pinned symmetric;
    VERDICT.md item 8)."""
    import torch
    import jax.numpy as jnp
    from pl_convlstm_gan_tpu.models import Generator
    from pl_convlstm_gan_tpu.tools.import_torch_checkpoint import convert_state_dict

    TorchGenerator = _import_reference_generator()
    torch.manual_seed(2)
    # input 4000m x 2000m cells -> 500m target: scale_w=8, scale_h=4
    ref = TorchGenerator(hidden_dims=[16, 32], lu_channels=5,
                         target_grid_size=(500, 500))
    b, t, h, w = 1, 3, 16, 16
    rain = rng.standard_normal((b, t, 1, h, w)).astype(np.float32)
    dem = rng.standard_normal((b, 1, h, w)).astype(np.float32)
    lu = rng.standard_normal((b, 5, h, w)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(rain), torch.from_numpy(dem),
                      torch.from_numpy(lu),
                      input_grid_size=(4000, 2000)).numpy()
    params = convert_state_dict({k: v.numpy() for k, v in ref.state_dict().items()})
    ours = Generator(hidden_dims=(16, 32), lu_channels=5,
                     target_grid_size=(500, 500))
    out = np.asarray(ours.apply(params, jnp.asarray(rain), jnp.asarray(dem),
                                jnp.asarray(lu), input_grid_size=(4000, 2000)))
    assert out.shape == ref_out.shape == (b, t, 1, h * 4, w * 8)
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=1e-4)


def test_early_stopping_matches_reference():
    """Decision-sequence parity with the reference EarlyStopping on a metric
    trace covering init/improve/stall/trigger."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from src.utils.early_stopping import EarlyStopping as RefES  # noqa
    from pl_convlstm_gan_tpu.train import EarlyStopping

    trace = [1.0, 0.9, 0.95, 0.89, 0.89, 0.891, 0.889, 0.95, 0.95, 0.95]
    ref = RefES(patience=3, min_delta=0.001, mode="min", verbose=False)
    ours = EarlyStopping(patience=3, min_delta=0.001, mode="min", verbose=False)
    for epoch, score in enumerate(trace):
        assert ref(score, epoch) == ours(score, epoch), (epoch, score)
        assert ref.early_stop == ours.early_stop, (epoch, score)
        assert ref.counter == ours.counter


def test_dataset_items_match_reference(tmp_path, monkeypatch):
    """FenheDataset item-for-item parity with the reference dataset on an
    on-disk fixture. The reference imports geopandas (absent here) only for the
    shapefile bbox — stub it with the same extent our pure-python parser reads."""
    import types
    import pandas as pd

    # fixture files (reuse the data-test builder; pytest puts tests/ on sys.path)
    from test_data import _fenhe_fixture  # type: ignore
    ds_ours = _fenhe_fixture(tmp_path, num_years=2)

    # the reference selects the Chinese meta column names via usecols
    meta_ref = pd.DataFrame({"F_站号": [1001, 1002, 9999],
                             "经度": [111.0, 112.5, 150.0],
                             "纬度": [36.0, 38.0, 36.0]})
    meta_ref.to_csv(tmp_path / "meta_ref.csv", index=False)

    class _FakeGdf:
        total_bounds = np.array([110.0, 35.0, 113.5, 39.0])

    fake_gpd = types.ModuleType("geopandas")
    fake_gpd.read_file = lambda path: _FakeGdf()
    monkeypatch.setitem(sys.modules, "geopandas", fake_gpd)
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from src.datasets.fenhe_dataset import FenheDataset as RefDataset  # noqa

    # reference reads .xlsx via pd.read_excel — feed it the csv through a shim
    monkeypatch.setattr(pd, "read_excel",
                        lambda path, **kw: pd.read_csv(
                            str(path).replace(".xlsx", ".csv"), **kw))
    ref = RefDataset(
        rain_lr_path=str(tmp_path / "rain.npy"),
        dem_path=str(tmp_path / "dem.npy"),
        lucc_path=str(tmp_path / "lucc.npy"),
        rain_meta_path=str(tmp_path / "meta_ref.csv"),
        rain_station_path=str(tmp_path / "rain_stations.csv"),
        shp_path=str(tmp_path / "basin.shp"),
        T=5, start_year=2012, end_year=2013)

    assert len(ref) == len(ds_ours)
    for idx in (0, 100, 400, len(ref) - 1):
        r = [np.asarray(x) for x in ref[idx]]
        o = [np.asarray(x) for x in ds_ours[idx]]
        for name, a, b in zip(("x_lr", "dem", "lu", "coords", "vals"), r, o):
            np.testing.assert_allclose(a, b, atol=1e-6, err_msg=f"{name}@{idx}")


def test_year_split_indices_match_reference(tmp_path, monkeypatch):
    """split_dataset_by_year index sets vs the reference implementation
    (including its drop-T-windows boundary arithmetic)."""
    import types
    import pandas as pd
    from test_data import _fenhe_fixture  # type: ignore
    from pl_convlstm_gan_tpu.data import split_dataset_by_year

    ds = _fenhe_fixture(tmp_path, num_years=2)

    class _FakeGdf:
        total_bounds = np.array([110.0, 35.0, 113.5, 39.0])

    fake_gpd = types.ModuleType("geopandas")
    fake_gpd.read_file = lambda path: _FakeGdf()
    monkeypatch.setitem(sys.modules, "geopandas", fake_gpd)
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from src.datasets.fenhe_dataset_split import split_dataset_by_year as ref_split  # noqa

    years = ((2012, 2012), (2013, 2013), (2013, 2013))
    ref_tr, ref_va, ref_te = ref_split(ds, *years)
    our_tr, our_va, our_te = split_dataset_by_year(ds, *years)
    assert list(ref_tr.indices) == list(our_tr.indices)
    assert list(ref_va.indices) == list(our_va.indices)
    assert list(ref_te.indices) == list(our_te.indices)


@pytest.mark.parametrize("strategy", ["log", "stratified", "sqrt", "none"])
def test_loss_weight_strategies_match_reference(rng, strategy):
    import torch
    import jax.numpy as jnp
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from src.losses.combined_loss import CombinedLoss as TorchCombinedLoss  # noqa
    from pl_convlstm_gan_tpu.losses import combined_loss

    b, t, h_lr, w_lr = 1, 3, 8, 8
    scale = 4.0
    pred = rng.standard_normal((b, t, 1, 32, 32), dtype=np.float32)
    lr = rng.standard_normal((b, t, 1, h_lr, w_lr), dtype=np.float32)
    coords = rng.integers(0, 8, (6, 2))
    vals = np.abs(rng.standard_normal((b, t, 6), dtype=np.float32)) * 40

    use_weighted = strategy != "none"
    ref_loss = TorchCombinedLoss(use_weighted_loss=use_weighted,
                                 weight_strategy=strategy)
    with torch.no_grad():
        ref_total, _ = ref_loss(torch.from_numpy(pred), torch.from_numpy(lr),
                                torch.from_numpy(coords),
                                torch.from_numpy(vals), scale)
    total, _ = combined_loss(jnp.asarray(pred), jnp.asarray(lr),
                             jnp.asarray(coords), jnp.asarray(vals), scale,
                             use_weighted_loss=use_weighted,
                             weight_strategy=strategy)
    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-4)
