"""Data-layer tests: Fenhe dataset semantics (shapes, one-hot, repair, splits,
leap years, shapefile extent), synthetic sources, pipeline + grain loader."""
import struct

import numpy as np
import pytest

from pl_convlstm_gan_tpu.data import (FenheDataset, Subset, SyntheticDownscalingDataset,
                                      SyntheticSequenceDataset, batch_iterator,
                                      days_in_year, is_leap_year, lucc_to_onehot,
                                      make_grain_loader, prefetch_to_device,
                                      read_shapefile_extent, repair_negative_values,
                                      split_dataset_by_year, split_dataset_random,
                                      year_indices)


def _write_shapefile(path, xmin=110.0, ymin=35.0, xmax=113.5, ymax=39.0):
    """Minimal valid .shp main header (100 bytes)."""
    header = bytearray(100)
    struct.pack_into(">i", header, 0, 9994)           # file code
    struct.pack_into(">i", header, 24, 50)            # file length (words)
    struct.pack_into("<i", header, 28, 1000)          # version
    struct.pack_into("<i", header, 32, 5)             # shape type: polygon
    struct.pack_into("<4d", header, 36, xmin, ymin, xmax, ymax)
    with open(path, "wb") as f:
        f.write(bytes(header))


def test_shapefile_extent(tmp_path):
    p = str(tmp_path / "basin.shp")
    _write_shapefile(p)
    assert read_shapefile_extent(p) == [35.0, 39.0, 110.0, 113.5]


def test_leap_year_arithmetic():
    assert is_leap_year(2012) and is_leap_year(2000)
    assert not is_leap_year(2013) and not is_leap_year(1900)
    assert days_in_year(2012) == 366 and days_in_year(2013) == 365


def test_lucc_onehot_data_dependent_classes():
    lucc = np.array([[0, 1, 3], [3, 5, 0]])
    oh = lucc_to_onehot(lucc)
    assert oh.shape == (3, 2, 3)          # classes {1, 3, 5}; 0 ignored
    np.testing.assert_array_equal(oh.sum(0), (lucc != 0).astype(np.float32))


def test_negative_repair_chain():
    spatial_mean = np.array([9.0, 9.0, 9.0, 9.0], np.float32)
    # temporal neighbors first
    s = np.array([1.0, -5.0, 3.0, 4.0], np.float32)
    out = repair_negative_values(s, spatial_mean)
    assert out[1] == pytest.approx(2.0)
    # no valid neighbors -> spatial mean
    s2 = np.array([-1.0, -1.0, -1.0, -1.0], np.float32)
    out2 = repair_negative_values(s2, spatial_mean)
    assert out2[0] == pytest.approx(9.0)
    # no valid neighbors + NaN spatial mean -> 0
    out3 = repair_negative_values(np.array([-1.0], np.float32),
                                  np.array([np.nan]))
    assert out3[0] == 0.0


def _fenhe_fixture(tmp_path, num_years=2, start_year=2012, multiyear_lucc=True,
                   drop_station_rows=0, lucc_layers=None,
                   second_year_classes=None):
    rng = np.random.default_rng(0)
    days = sum(days_in_year(start_year + i) for i in range(num_years))
    h, w, hs, ws = 6, 5, 12, 10
    np.save(tmp_path / "rain.npy", rng.random((days, h, w)).astype(np.float32))
    np.save(tmp_path / "dem.npy", rng.random((hs, ws)).astype(np.float32) * 2000)
    if multiyear_lucc:
        layers = num_years if lucc_layers is None else lucc_layers
        lucc = rng.integers(1, 4, (layers, hs, ws))
        if second_year_classes is not None and layers > 1:
            lucc[1] = rng.choice(second_year_classes, (hs, ws))
    else:
        lucc = rng.integers(1, 4, (hs, ws))
    np.save(tmp_path / "lucc.npy", lucc)
    shp = str(tmp_path / "basin.shp")
    _write_shapefile(shp, 110.0, 35.0, 113.5, 39.0)

    # station csv tables
    import pandas as pd
    meta = pd.DataFrame({"station_id": [1001, 1002, 9999],
                         "lon": [111.0, 112.5, 150.0],   # 9999 out of bounds
                         "lat": [36.0, 38.0, 36.0]})
    meta.to_csv(tmp_path / "meta.csv", index=False)
    dates = []
    for i in range(num_years):
        y = start_year + i
        for d in range(days_in_year(y)):
            dates.append((y, 1 + d // 31, 1 + d % 31))
    rain = pd.DataFrame({
        "year": [d[0] for d in dates], "month": [d[1] for d in dates],
        "day": [d[2] for d in dates],
        "1001": rng.random(days).astype(np.float32) * 10,
        "1002": rng.random(days).astype(np.float32) * 10,
    })
    rain.iloc[5, rain.columns.get_loc("1001")] = -3.0   # trigger repair
    if drop_station_rows:
        rain = rain.iloc[:-drop_station_rows]
    rain.to_csv(tmp_path / "rain_stations.csv", index=False)
    return FenheDataset(
        rain_lr_path=str(tmp_path / "rain.npy"), dem_path=str(tmp_path / "dem.npy"),
        lucc_path=str(tmp_path / "lucc.npy"), rain_meta_path=str(tmp_path / "meta.csv"),
        rain_station_path=str(tmp_path / "rain_stations.csv"), shp_path=shp,
        T=5, start_year=start_year, end_year=start_year + num_years - 1)


def test_fenhe_dataset_shapes_and_invariants(tmp_path):
    ds = _fenhe_fixture(tmp_path)
    assert len(ds) == 366 + 365 - 5
    x_lr, dem, lu, s_coords, s_vals = ds[0]
    assert x_lr.shape == (5, 1, 6, 5)
    assert dem.shape == (1, 12, 10)
    assert lu.shape[0] == ds.num_lu_classes and lu.shape[1:] == (12, 10)
    assert s_coords.shape == (2, 2)        # out-of-bounds station dropped
    assert s_vals.shape == (5, 2)
    # DEM normalized to [0, 1]; covariates higher-res than rain
    assert 0.0 <= dem.min() and dem.max() <= 1.0
    assert dem.shape[-1] > x_lr.shape[-1]
    # negative value repaired
    assert (ds.s_values >= 0).all()


def test_fenhe_multiyear_lucc_selection(tmp_path):
    ds = _fenhe_fixture(tmp_path, num_years=2, multiyear_lucc=True)
    assert ds.is_multiyear_lucc
    # window midpoint in year 0 vs year 1 picks different LUCC frames
    _, _, lu_first, _, _ = ds[0]
    _, _, lu_second, _, _ = ds[400]
    assert lu_first.shape == lu_second.shape
    np.testing.assert_array_equal(lu_first, ds.lucc_onehot_list[0])
    np.testing.assert_array_equal(lu_second, ds.lucc_onehot_list[1])


def test_year_split_no_leakage(tmp_path):
    ds = _fenhe_fixture(tmp_path, num_years=2)
    train, val, test = split_dataset_by_year(ds, (2012, 2012), (2013, 2013),
                                             (2013, 2013))
    # reference arithmetic: each year contributes days_in_year - T windows
    assert len(train) == 366 - 5
    assert len(val) == 365 - 5
    # no train window may extend into 2013: max start index + T <= 366
    assert max(train.indices) + ds.T <= 366


def test_random_split_partition(tmp_path):
    ds = _fenhe_fixture(tmp_path)
    a, b, c = split_dataset_random(ds, seed=7)
    all_idx = sorted(a.indices + b.indices + c.indices)
    assert all_idx == list(range(len(ds)))
    assert len(a) == int(len(ds) * 0.7)


def test_synthetic_downscaling_items():
    ds = SyntheticDownscalingDataset(num_days=32, T=5, lr_size=8, scale_factor=4,
                                     num_stations=6, seed=1)
    assert len(ds) == 27
    x_lr, dem, lu, coords, vals = ds[3]
    assert x_lr.shape == (5, 1, 8, 8) and dem.shape == (1, 32, 32)
    assert lu.shape == (5, 32, 32) and coords.shape == (6, 2)
    assert vals.shape == (5, 6)
    assert (x_lr >= 0).all()
    # determinism
    ds2 = SyntheticDownscalingDataset(num_days=32, T=5, lr_size=8, scale_factor=4,
                                      num_stations=6, seed=1)
    np.testing.assert_array_equal(ds.rain_lr, ds2.rain_lr)


def test_synthetic_sequences_move():
    ds = SyntheticSequenceDataset(num_sequences=4, input_frames=3, output_frames=5,
                                  image_size=32, seed=2)
    inp, tgt = ds[0]
    assert inp.shape == (3, 1, 32, 32) and tgt.shape == (5, 1, 32, 32)
    assert inp.max() <= 1.0 and inp.min() >= 0.0
    assert not np.allclose(inp[0], inp[2])   # blobs actually move
    inp2, _ = ds[0]
    np.testing.assert_array_equal(inp, inp2)  # deterministic per index


def test_batch_iterator_and_prefetch():
    ds = SyntheticSequenceDataset(num_sequences=10, input_frames=2, output_frames=2,
                                  image_size=8)
    batches = list(batch_iterator(ds, 4, shuffle=True, seed=0, drop_last=True))
    assert len(batches) == 2
    assert batches[0][0].shape == (4, 2, 1, 8, 8)
    fetched = list(prefetch_to_device(batch_iterator(ds, 4, drop_last=True), size=2))
    assert len(fetched) == 2
    assert fetched[0][0].shape == (4, 2, 1, 8, 8)


def test_grain_loader():
    ds = SyntheticSequenceDataset(num_sequences=12, input_frames=2, output_frames=2,
                                  image_size=8)
    loader = make_grain_loader(ds, batch_size=4, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0][0].shape == (4, 2, 1, 8, 8)


def test_eval_batches_wrap_padding():
    from pl_convlstm_gan_tpu.data.pipeline import eval_batches
    ds = SyntheticSequenceDataset(num_sequences=10, input_frames=2,
                                  output_frames=2, image_size=8)
    batches = list(eval_batches(ds, 4))
    assert [n for _, n in batches] == [4, 4, 2]
    # every batch keeps the full static shape
    assert all(b[0].shape[0] == 4 for b, _ in batches)
    # wrap-padded tail: last batch's padding repeats items from the start
    last, n_valid = batches[-1]
    inp0, _ = ds[0]
    np.testing.assert_array_equal(last[0][n_valid], inp0)


def test_npy_frames_dataset_layouts(tmp_path):
    """On-disk frame stacks for the sequence families: [N,T,H,W], [N,T,C,H,W],
    and single-movie [T,H,W] with stride windows."""
    from pl_convlstm_gan_tpu.data import NpyFramesDataset
    rng = np.random.default_rng(0)

    seqs = rng.random((6, 7, 8, 8)).astype(np.float32)
    np.save(tmp_path / "seqs.npy", seqs)
    ds = NpyFramesDataset(str(tmp_path / "seqs.npy"), 3, 4)
    assert len(ds) == 6
    x, y = ds[2]
    assert x.shape == (3, 1, 8, 8) and y.shape == (4, 1, 8, 8)
    np.testing.assert_array_equal(x[:, 0], seqs[2, :3])
    np.testing.assert_array_equal(y[:, 0], seqs[2, 3:7])

    seqs5 = rng.random((4, 6, 2, 8, 8)).astype(np.float32)
    np.save(tmp_path / "seqs5.npy", seqs5)
    ds5 = NpyFramesDataset(str(tmp_path / "seqs5.npy"), 2, 3)
    x, y = ds5[1]
    assert x.shape == (2, 2, 8, 8) and y.shape == (3, 2, 8, 8)

    movie = rng.random((20, 8, 8)).astype(np.float32)
    np.save(tmp_path / "movie.npy", movie)
    dm = NpyFramesDataset(str(tmp_path / "movie.npy"), 2, 3, stride=5)
    assert len(dm) == 4  # (20 - 5) // 5 + 1
    x, y = dm[1]
    np.testing.assert_array_equal(x[:, 0], movie[5:7])
    np.testing.assert_array_equal(y[:, 0], movie[7:10])

    # scale normalization + npz
    np.savez(tmp_path / "f.npz", frames=seqs)
    dz = NpyFramesDataset(str(tmp_path / "f.npz"), 3, 4, scale=0.5)
    x, _ = dz[0]
    np.testing.assert_allclose(x[:, 0], seqs[0, :3] * 0.5, rtol=1e-6)

    with pytest.raises(ValueError):
        NpyFramesDataset(str(tmp_path / "seqs.npy"), 5, 5)  # too short


def test_sequence_trainer_frames_source(tmp_path):
    """SequenceTrainer end-to-end on an on-disk frame stack (source=frames)."""
    from pl_convlstm_gan_tpu.config import Config
    from pl_convlstm_gan_tpu.train import SequenceTrainer
    rng = np.random.default_rng(1)
    np.save(tmp_path / "frames.npy", rng.random((48, 5, 12, 12)).astype(np.float32))
    cfg = Config.from_dict({
        "data": {"source": "frames", "frames_path": str(tmp_path / "frames.npy")},
        "model": {"family": "forecaster", "hidden_dims": [8],
                  "input_frames": 2, "output_frames": 3},
        "training": {"batch_size": 8, "epochs": 1, "learning_rate": 1e-3,
                     "use_split": True, "use_early_stopping": False},
        "output": {"output_dir": str(tmp_path / "out"), "log_interval": 100},
    })
    t = SequenceTrainer(config=cfg)
    history = t.train()
    assert len(history["epoch"]) == 1
    assert np.isfinite(history["total_loss"][0])


def test_grain_loader_equal_batch_counts_across_hosts():
    """Multi-host grain sharding must yield the SAME number of batches on
    every host (a count mismatch would desync the distributed step loop and
    deadlock collectives) — n % process_count != 0 is the dangerous case."""
    from pl_convlstm_gan_tpu.data import SyntheticSequenceDataset
    from pl_convlstm_gan_tpu.data.pipeline import make_grain_loader
    ds = SyntheticSequenceDataset(num_sequences=15, input_frames=2,
                                  output_frames=2, image_size=8, seed=0)
    counts, seen = [], []
    for p in range(2):
        batches = list(make_grain_loader(ds, 8, shuffle=True, seed=1,
                                         process_index=p, process_count=2))
        counts.append(len(batches))
        for b in batches:
            assert b[0].shape[0] == 4  # local batch = global / process_count
    assert counts[0] == counts[1] == 1  # floor(15/2)=7 -> 1 local batch of 4


def test_fenhe_station_day_mismatch_raises(tmp_path):
    """A station table whose day count disagrees with rain_lr's day axis must
    hard-fail (silent misalignment would shift supervision by one day)."""
    import pandas as pd
    with pytest.raises(ValueError, match="days"):
        _fenhe_fixture(tmp_path, drop_station_rows=1)


def test_fenhe_multiyear_lucc_layer_count_mismatch_raises(tmp_path):
    """Multi-year LUCC with fewer layers than the year span (no mapping file)
    must raise with a pointer to lucc_year_mapping.npy, not IndexError."""
    with pytest.raises(ValueError, match="lucc_year_mapping"):
        _fenhe_fixture(tmp_path, lucc_layers=1)


def test_fenhe_lucc_class_set_mismatch_raises(tmp_path):
    """Years with differing LUCC class sets would make one-hot channel k mean
    different classes per year — fail fast."""
    with pytest.raises(ValueError, match="class sets"):
        _fenhe_fixture(tmp_path, second_year_classes=(1, 2))


def test_grain_loader_num_epochs_none_is_endless(tmp_path):
    """num_epochs=None follows grain's repeat(None) convention: an endless
    stream, not a silent single epoch."""
    ds = _fenhe_fixture(tmp_path)
    from itertools import islice
    loader = make_grain_loader(ds, batch_size=8, num_epochs=None,
                               shard_by_process=False)
    per_epoch = len(ds) // 8
    batches = list(islice(iter(loader), per_epoch + 3))
    assert len(batches) == per_epoch + 3


def test_grain_loader_multiprocess_workers_match_inprocess():
    """worker_count > 0 routes through grain's mp_prefetch (pickled dataset +
    pipeline, shared-memory transfer). The worker path must yield exactly the
    batches the in-process path yields — a broken pickle/shm path would
    otherwise only surface in production (`data.worker_count`)."""
    ds = SyntheticSequenceDataset(num_sequences=12, input_frames=2,
                                  output_frames=2, image_size=8)
    inproc = list(make_grain_loader(ds, batch_size=4, shuffle=True, seed=3))
    workers = list(make_grain_loader(ds, batch_size=4, shuffle=True, seed=3,
                                     worker_count=2))
    assert len(workers) == len(inproc) == 3
    for a, b in zip(inproc, workers):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
