"""ETL tool tests for the pieces runnable without the heavy geo stack:
multiyear merge, station readers, and the station-comparison metrics/CLI core."""
import numpy as np
import pandas as pd
import pytest

from pl_convlstm_gan_tpu.tools.merge_multiyear import merge_lucc_data, merge_rain_data
from pl_convlstm_gan_tpu.tools.compare_station import (compare_systems,
                                                       compute_metrics,
                                                       load_satellite_csv,
                                                       nearest_cell)
from pl_convlstm_gan_tpu.tools.station import read_rain, read_station_meta


def test_merge_rain_and_lucc(tmp_path):
    rng = np.random.default_rng(0)
    for year, days in [(2012, 366), (2013, 365)]:
        np.save(tmp_path / f"rain_{year}.npy",
                rng.random((days, 4, 3)).astype(np.float32))
        np.save(tmp_path / f"lucc_{year}.npy", rng.integers(1, 5, (6, 5)))
    merged = merge_rain_data(str(tmp_path / "rain_{year}.npy"), 2012, 2013,
                             str(tmp_path / "rain_all.npy"))
    assert merged.shape == (731, 4, 3)
    stacked = merge_lucc_data(str(tmp_path / "lucc_{year}.npy"), 2012, 2013,
                              str(tmp_path / "lucc_all.npy"))
    assert stacked.shape == (2, 6, 5)
    mapping = np.load(tmp_path / "lucc_year_mapping.npy")
    np.testing.assert_array_equal(mapping, [2012, 2013])


def _station_tables(tmp_path, days=20):
    rng = np.random.default_rng(1)
    meta = pd.DataFrame({"station_id": [1, 2], "lon": [111.0, 112.0],
                         "lat": [36.0, 37.0]})
    meta.to_csv(tmp_path / "meta.csv", index=False)
    rain = pd.DataFrame({
        "year": [2012] * days, "month": [1] * days,
        "day": list(range(1, days + 1)),
        "1": rng.random(days).astype(np.float32) * 10,
        "2": rng.random(days).astype(np.float32) * 10})
    rain.to_csv(tmp_path / "rain.csv", index=False)
    return meta, rain


def test_station_readers(tmp_path):
    _station_tables(tmp_path)
    meta = read_station_meta(str(tmp_path / "meta.csv"))
    assert meta == {1: (111.0, 36.0), 2: (112.0, 37.0)}
    series = read_rain(str(tmp_path / "rain.csv"), 1, 2012, 2012)
    assert series.shape == (20,)
    with pytest.raises(KeyError):
        read_rain(str(tmp_path / "rain.csv"), 99, 2012, 2012)


def test_compute_metrics_and_nearest():
    obs = np.array([1.0, 2.0, np.nan, 4.0])
    sat = np.array([1.5, 2.5, 3.0, np.nan])
    m = compute_metrics(obs, sat)
    assert m["overlap"] == 2
    assert m["mae"] == pytest.approx(0.5)
    assert nearest_cell(np.array([36.0, 37.0]), np.array([111.0, 112.0]),
                        36.9, 111.9) == 1


def test_compare_systems_end_to_end(tmp_path):
    _, rain = _station_tables(tmp_path)
    # synthetic satellite CSV with the cmorph export layout
    times = pd.date_range("2012-01-01", periods=20)
    cols = ["36.000_111.000", "37.000_112.000"]
    sat = pd.DataFrame(np.random.default_rng(2).random((20, 2)) * 10,
                       index=times, columns=cols)
    sat.to_csv(tmp_path / "sat.csv")
    times2, lats, lons, vals = load_satellite_csv(str(tmp_path / "sat.csv"))
    assert vals.shape == (20, 2) and list(lats) == [36.0, 37.0]

    summary = compare_systems({"hydro": str(tmp_path / "sat.csv")},
                              str(tmp_path / "meta.csv"),
                              str(tmp_path / "rain.csv"), 2012, 2012,
                              str(tmp_path / "cmp"), make_plots=False)
    assert len(summary) == 2
    assert "hydro_rmse" in summary.columns
    assert (tmp_path / "cmp" / "station_comparison_summary.csv").exists()


def test_torch_checkpoint_roundtrip(tmp_path):
    """our params -> reference-style state_dict -> back == identity; and the
    converted params drive the model identically."""
    import jax
    import jax.numpy as jnp
    from pl_convlstm_gan_tpu.models import Generator
    from pl_convlstm_gan_tpu.tools.import_torch_checkpoint import (
        convert_state_dict, export_state_dict)

    rng = np.random.default_rng(0)
    model = Generator(hidden_dims=(16, 32), lu_channels=3, scale_factor=4)
    rain = jnp.asarray(rng.random((1, 2, 1, 8, 8)).astype(np.float32))
    dem = jnp.asarray(rng.random((1, 1, 8, 8)).astype(np.float32))
    lu = jnp.asarray(rng.random((1, 3, 8, 8)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), rain, dem, lu)

    sd = export_state_dict(jax.tree_util.tree_map(np.asarray, params))
    # reference-style names present
    assert "cell1.conv.weight" in sd and "upsample_blocks.1.conv.bias" in sd
    assert sd["init_conv.weight"].shape[:2] == (16, 3)   # OIHW

    back = convert_state_dict(sd)
    key = lambda kv: str(kv[0])
    a_leaves = sorted(jax.tree_util.tree_leaves_with_path(params), key=key)
    b_leaves = sorted(jax.tree_util.tree_leaves_with_path(back), key=key)
    assert [str(k) for k, _ in a_leaves] == [str(k) for k, _ in b_leaves]
    for (_, a), (_, b) in zip(a_leaves, b_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out_a = model.apply(params, rain, dem, lu)
    out_b = model.apply(back, rain, dem, lu)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=0)
