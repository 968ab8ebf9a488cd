"""Fenhe basin dataset — numpy re-implementation of the reference's
``FenheDataset`` semantics (``/root/reference/src/datasets/fenhe_dataset.py:20-218``):

- satellite rain npy with nan_to_num (:26-29)
- min-max DEM normalization (:32-33)
- LUCC single-year or multi-year with per-year one-hot over unique nonzero classes
  (:36-63, 107-121) and leap-year-aware day -> year-index mapping (:80-102)
- station prep from a meta table (id, lon, lat) + a daily rain table: lat/lon -> grid
  index via the shapefile extent (:136-151), out-of-bounds skip (:153-155),
  negative-value repair by temporal neighbors -> spatial mean -> 0 (:163-179)
- windows: ``len = num_days - T``; item = (x_lr [T,1,H,W], dem [1,Hd,Wd],
  lu [C,Hl,Wl], s_coords [N,2], s_vals [T,N]) with multi-year LUCC selected by the
  window-midpoint year (:195-218)

Differences by design (TPU build):
- no torch: items are numpy arrays, batched by the pipeline and shipped to device as
  one stacked transfer (the reference pays per-tensor H2D per batch,
  trainer.py:287-288).
- station tables load from .xlsx when openpyxl is available OR from .csv with the
  same columns — the heavy geo deps (geopandas) are replaced by a 30-line pure-python
  shapefile bbox reader (the reference only uses the *extent*, fenhe_dataset.py:12-15).
"""
from __future__ import annotations

import os
import struct
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np


def read_shapefile_extent(shp_path: str) -> List[float]:
    """[min_lat, max_lat, min_lon, max_lon] from the ESRI shapefile main header.

    The .shp header (100 bytes) stores the bounding box as four little-endian
    doubles at byte 36: Xmin, Ymin, Xmax, Ymax (ESRI whitepaper, 1998). This is all
    the reference uses geopandas for (fenhe_dataset.py:12-15)."""
    with open(shp_path, "rb") as f:
        header = f.read(100)
    if len(header) < 68:
        raise ValueError(f"Not a valid shapefile: {shp_path}")
    xmin, ymin, xmax, ymax = struct.unpack("<4d", header[36:68])
    return [ymin, ymax, xmin, xmax]


def is_leap_year(year: int) -> bool:
    return (year % 4 == 0 and year % 100 != 0) or (year % 400 == 0)


def days_in_year(year: int) -> int:
    return 366 if is_leap_year(year) else 365


def lucc_to_onehot(lucc: np.ndarray, ignore_index: int = 0) -> np.ndarray:
    """One-hot over the unique nonzero classes (fenhe_dataset.py:107-121).
    NOTE: class count is data-dependent and feeds the model's lu_channels."""
    valid = lucc != ignore_index
    labels = np.unique(lucc[valid])
    h, w = lucc.shape
    onehot = np.zeros((len(labels), h, w), dtype=np.float32)
    for i, label in enumerate(labels):
        onehot[i, lucc == label] = 1.0
    return onehot


def _read_table(path: str, **kwargs):
    """Read station tables: .xlsx via pandas/openpyxl if available, else .csv."""
    import pandas as pd
    if str(path).endswith((".csv", ".txt")):
        return pd.read_csv(path, **kwargs)
    try:
        return pd.read_excel(path, **kwargs)
    except ImportError as e:
        csv_alt = str(Path(path).with_suffix(".csv"))
        if os.path.exists(csv_alt):
            return pd.read_csv(csv_alt, **kwargs)
        raise ImportError(
            f"Reading {path} needs openpyxl (not installed). Provide a .csv with "
            f"the same columns at {csv_alt} instead.") from e


def repair_negative_values(series: np.ndarray, spatial_mean: np.ndarray) -> np.ndarray:
    """Negative-value repair: mean of valid temporal neighbors, else the across-
    station spatial mean, else 0 (fenhe_dataset.py:163-179)."""
    out = series.copy()
    for t in range(len(out)):
        if out[t] >= 0:
            continue
        candidates = []
        if t - 1 >= 0 and out[t - 1] >= 0:
            candidates.append(out[t - 1])
        if t + 1 < len(out) and series[t + 1] >= 0:
            candidates.append(series[t + 1])
        if candidates:
            out[t] = np.mean(candidates)
        elif not np.isnan(spatial_mean[t]):
            out[t] = spatial_mean[t]
        else:
            out[t] = 0.0
    return out


class FenheDataset:
    """Map-style dataset over daily windows. See module docstring."""

    def __init__(self, rain_lr_path: str, dem_path: str, lucc_path: str,
                 rain_meta_path: str = "", rain_station_path: str = "",
                 shp_path: str = "", T: int = 5,
                 start_year: int = 2012, end_year: int = 2021,
                 grid_extent: Optional[Sequence[float]] = None):
        self.rain_lr = np.nan_to_num(np.load(rain_lr_path).astype(np.float32),
                                     nan=0.0, posinf=0.0, neginf=0.0)

        self.dem = np.load(dem_path)
        self.dem_norm = ((self.dem - self.dem.min())
                         / (self.dem.max() - self.dem.min() + 1e-7)).astype(np.float32)

        lucc_data = np.load(lucc_path)
        if lucc_data.ndim == 3:
            self.lucc_multiyear = lucc_data.astype(int)
            self.is_multiyear_lucc = True
            year_mapping_path = Path(lucc_path).parent / "lucc_year_mapping.npy"
            if year_mapping_path.exists():
                self.lucc_years = np.load(year_mapping_path)
            else:
                self.lucc_years = np.arange(start_year, end_year + 1)
            if len(self.lucc_years) != self.lucc_multiyear.shape[0]:
                raise ValueError(
                    f"Multi-year LUCC has {self.lucc_multiyear.shape[0]} "
                    f"layers but the year mapping covers "
                    f"{len(self.lucc_years)} years "
                    f"({self.lucc_years[0]}..{self.lucc_years[-1]}). Provide "
                    f"a lucc_year_mapping.npy (tools/merge_multiyear.py "
                    f"writes one) when layers are not one-per-calendar-year.")
            self.lucc_onehot_list = [lucc_to_onehot(self.lucc_multiyear[i])
                                     for i in range(len(self.lucc_years))]
            # reference semantics (fenhe_dataset.py:107-121): each year is
            # one-hot over its OWN unique nonzero classes. If class sets
            # differ across years, channel k means different things per year
            # (and differing counts would crash batch stacking) — fail fast
            # with a real explanation instead.
            class_sets = [tuple(np.unique(l[l != 0]))
                          for l in self.lucc_multiyear]
            if len(set(class_sets)) > 1:
                raise ValueError(
                    "LUCC class sets differ across years "
                    f"({dict(zip(map(int, self.lucc_years), class_sets))}); "
                    "per-year one-hot channels would be inconsistent. "
                    "Harmonize the rasters (tools/merge_multiyear.py) first.")
            self._build_day_to_year_idx(start_year, end_year)
        else:
            self.lucc = lucc_data.astype(int)
            self.lucc_onehot = lucc_to_onehot(self.lucc)
            self.is_multiyear_lucc = False

        self.T = T
        self.start_year = start_year
        self.end_year = end_year

        if grid_extent is not None:
            self.grid_extent = list(grid_extent)
        elif shp_path:
            self.grid_extent = read_shapefile_extent(shp_path)
        else:
            raise ValueError("Provide shp_path or grid_extent")

        if rain_meta_path and rain_station_path:
            self.s_coords, self.s_values = self._prepare_stations(
                rain_meta_path, rain_station_path, start_year, end_year)
        else:
            raise ValueError("rain_meta_path and rain_station_path are required")

    @property
    def num_lu_classes(self) -> int:
        if self.is_multiyear_lucc:
            return self.lucc_onehot_list[0].shape[0]
        return self.lucc_onehot.shape[0]

    def _build_day_to_year_idx(self, start_year: int, end_year: int) -> None:
        """Cumulative-day -> LUCC-year-index map, leap-year aware
        (fenhe_dataset.py:80-102)."""
        idx = []
        for year in range(start_year, end_year + 1):
            where = np.where(self.lucc_years == year)[0]
            year_idx = int(where[0]) if len(where) else \
                int(np.argmin(np.abs(self.lucc_years - year)))
            idx.extend([year_idx] * days_in_year(year))
        self.day_to_year_idx = np.asarray(idx)

    def _prepare_stations(self, meta_path: str, station_path: str,
                          start_year: int, end_year: int):
        import pandas as pd
        df_meta = _read_table(meta_path)
        # reference columns: F_站号 (station id), 经度 (lon), 纬度 (lat); accept
        # romanized aliases for csv-converted inputs.
        col_id = next(c for c in ("F_站号", "station_id", "id") if c in df_meta.columns)
        col_lon = next(c for c in ("经度", "lon", "longitude") if c in df_meta.columns)
        col_lat = next(c for c in ("纬度", "lat", "latitude") if c in df_meta.columns)

        df_rain = (_read_table(station_path)
                   .query(f"year >= {start_year} and year <= {end_year}")
                   .sort_values(["year", "month", "day"])
                   .reset_index(drop=True))

        min_lat, max_lat, min_lon, max_lon = self.grid_extent
        rows_total, cols_total = self.rain_lr.shape[-2:]

        rain_values = df_rain.drop(columns=["year", "month", "day"], errors="ignore")
        spatial_mean = rain_values.mask(rain_values < 0).mean(axis=1).to_numpy()

        coords, val_list = [], []
        for _, row in df_meta.iterrows():
            st_id = int(row[col_id])
            lat, lon = row[col_lat], row[col_lon]
            # int() truncation toward zero matches the reference exactly
            # (fenhe_dataset.py:151-152, parity-pinned): a coordinate a hair
            # outside the extent truncates to 0 and is KEPT at the edge cell
            # rather than skipped — reference-faithful by design.
            r_idx = int((max_lat - lat) / (max_lat - min_lat) * (rows_total - 1))
            c_idx = int((lon - min_lon) / (max_lon - min_lon) * (cols_total - 1))
            if not (0 <= r_idx < rows_total and 0 <= c_idx < cols_total):
                print(f"Station {st_id} ({lat},{lon}) out of bounds, skipped")
                continue
            col = str(st_id)
            if col not in df_rain.columns:
                continue
            series = df_rain[col].to_numpy(dtype=np.float32)
            series = repair_negative_values(series, spatial_mean)
            coords.append([r_idx, c_idx])
            val_list.append(series)

        if not val_list:
            raise ValueError("No valid stations found within grid bounds!")
        stacked = np.nan_to_num(np.stack(val_list, axis=1).astype(np.float32),
                                nan=0.0, posinf=0.0, neginf=0.0)
        # a station table with missing/duplicate days would silently shift
        # every observation after the gap against rain_lr's day axis (and
        # ragged-slice the last windows) — hard-fail instead
        if stacked.shape[0] != self.rain_lr.shape[0]:
            raise ValueError(
                f"Station table covers {stacked.shape[0]} days but rain_lr "
                f"has {self.rain_lr.shape[0]}: the daily series must align "
                f"one-to-one with the rain grid (check for missing or "
                f"duplicated dates in {station_path})")
        return np.asarray(coords, dtype=np.int64), stacked

    def __len__(self) -> int:
        return self.rain_lr.shape[0] - self.T

    def __getitem__(self, idx: int):
        x_lr = self.rain_lr[idx:idx + self.T][:, None, ...]        # [T,1,H,W]
        dem = self.dem_norm[None, ...]                             # [1,Hd,Wd]
        if self.is_multiyear_lucc:
            mid_idx = min(idx + self.T // 2, len(self.day_to_year_idx) - 1)
            lu = self.lucc_onehot_list[self.day_to_year_idx[mid_idx]]
        else:
            lu = self.lucc_onehot
        s_vals = self.s_values[idx:idx + self.T]                   # [T,N]
        return (x_lr.astype(np.float32), dem.astype(np.float32),
                lu.astype(np.float32), self.s_coords.copy(), s_vals.astype(np.float32))
