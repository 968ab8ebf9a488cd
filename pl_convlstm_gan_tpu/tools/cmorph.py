"""CMORPH ingest: hourly 0.25-degree NetCDF -> basin-masked daily precipitation.

Port of the reference ETL (``/root/reference/src/scripts/cmorph.py:11-207``):
open_mfdataset concat on time, longitude 0..360 -> -180..180 + sort, 3-D polygon
basin mask from a shapefile (regionmask), bbox crop, leap-year/duplicate-timestamp
QC, and TWO daily accumulation systems:

- hydrological "08-08" (Beijing time) == UTC-day resample ``sum(min_count=24)``
- meteorological "20-20" == ``shift(time=-12h)`` then the same resample

exporting npy + per-system CSV and a comparison plot.

Requires: xarray, regionmask, geopandas (lazy imports; not TPU-host deps).
Usage: python -m pl_convlstm_gan_tpu.tools.cmorph --nc-glob 'cmorph_*.nc' \
           --shp fenhe.shp --out-dir data/processed/daily --year 2012
"""
from __future__ import annotations

import argparse
import os


def process_cmorph_to_fenhe(nc_glob: str, shp_path: str, out_dir: str, year: int,
                            make_plot: bool = True):
    import numpy as np
    import pandas as pd
    import xarray as xr
    import regionmask
    import geopandas as gpd

    os.makedirs(out_dir, exist_ok=True)

    ds = xr.open_mfdataset(nc_glob, combine="by_coords")
    var = "cmorph" if "cmorph" in ds else list(ds.data_vars)[0]

    # longitude 0..360 -> -180..180, sorted (reference cmorph.py:31-34)
    if float(ds.lon.max()) > 180:
        ds = ds.assign_coords(lon=(((ds.lon + 180) % 360) - 180)).sortby("lon")

    # basin polygon mask (reference cmorph.py:37-58)
    gdf = gpd.read_file(shp_path)
    mask = regionmask.mask_3D_geopandas(gdf, ds.lon, ds.lat)
    masked = ds[var].where(mask.isel(region=0))

    # crop to basin bbox (reference cmorph.py:61-72)
    minx, miny, maxx, maxy = gdf.total_bounds
    masked = masked.sel(lon=slice(minx, maxx), lat=slice(miny, maxy))
    if masked.lat.size == 0:  # descending-lat files
        masked = ds[var].where(mask.isel(region=0)).sel(
            lon=slice(minx, maxx), lat=slice(maxy, miny))

    # QC: drop duplicate timestamps, check hour count vs leap year
    # (reference cmorph.py:74-106)
    _, unique_idx = np.unique(masked.time.values, return_index=True)
    masked = masked.isel(time=np.sort(unique_idx))
    is_leap = (year % 4 == 0 and year % 100 != 0) or (year % 400 == 0)
    expected_hours = (366 if is_leap else 365) * 24
    if masked.time.size != expected_hours:
        print(f"[QC] {year}: have {masked.time.size} hourly steps, "
              f"expected {expected_hours}")

    # two accumulation systems (reference cmorph.py:108-114)
    daily_hydro = masked.resample(time="1D").sum(min_count=24)
    daily_cma = masked.shift(time=-12).resample(time="1D").sum(min_count=24)

    results = {}
    for name, daily in (("hydro_08-08", daily_hydro), ("cma_20-20", daily_cma)):
        arr = daily.values.astype(np.float32)
        npy_path = os.path.join(out_dir, f"fenhe_{name}_{year}.npy")
        np.save(npy_path, arr)
        # per-cell CSV export (reference cmorph.py:121-141)
        flat = arr.reshape(arr.shape[0], -1)
        cols = [f"{float(la):.3f}_{float(lo):.3f}"
                for la in daily.lat.values for lo in daily.lon.values]
        pd.DataFrame(flat, index=daily.time.values, columns=cols).to_csv(
            os.path.join(out_dir, f"fenhe_{name}_{year}.csv"))
        results[name] = arr
        print(f"saved {npy_path} {arr.shape}")

    if make_plot:
        _comparison_plot(results, out_dir, year)
    return results


def _comparison_plot(results, out_dir: str, year: int):
    """Basin-mean daily series for both accumulation systems
    (reference cmorph.py:144-176)."""
    import numpy as np
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(14, 5))
    for name, arr in results.items():
        series = np.nanmean(arr.reshape(arr.shape[0], -1), axis=1)
        plt.plot(series, label=name, linewidth=1)
    plt.xlabel("day of year")
    plt.ylabel("basin-mean precipitation (mm/day)")
    plt.title(f"CMORPH daily accumulation systems, {year}")
    plt.legend()
    plt.tight_layout()
    path = os.path.join(out_dir, f"accumulation_comparison_{year}.png")
    plt.savefig(path, dpi=150)
    plt.close()
    print(f"saved {path}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--nc-glob", required=True)
    p.add_argument("--shp", required=True)
    p.add_argument("--out-dir", default="data/processed/daily")
    p.add_argument("--start-year", type=int, default=2012)
    p.add_argument("--end-year", type=int, default=2021)
    p.add_argument("--no-plot", action="store_true")
    args = p.parse_args()
    for year in range(args.start_year, args.end_year + 1):
        glob_y = args.nc_glob.format(year=year)
        process_cmorph_to_fenhe(glob_y, args.shp, args.out_dir, year,
                                make_plot=not args.no_plot)


if __name__ == "__main__":
    main()
