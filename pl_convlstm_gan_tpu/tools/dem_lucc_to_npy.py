"""Static-feature ETL: 30 m GeoTIFF -> 1 km npy grids.

Port of the reference (``/root/reference/src/scripts/dem_lucc_to_npy.py:5-141``):
dask-chunked rioxarray load; DEM cleaned with ``where(< 9000)`` then 33x33
coarsen-MEAN; LUCC cleaned (255 -> 0) then coarsen-MAX (dominant-ish class without a
mode pass); saves the grid npy plus lon/lat coordinate vectors. DEM converted once,
LUCC per year.

Requires rioxarray + dask (lazy imports).
Usage: python -m pl_convlstm_gan_tpu.tools.dem_lucc_to_npy --dem dem_30m.tif \
           --lucc 'lucc_{year}_30m.tif' --out-dir data/processed/static_features_1km
"""
from __future__ import annotations

import argparse
import os


def convert_tif_to_npy(tif_path: str, out_prefix: str, kind: str,
                       coarsen: int = 33):
    """kind: 'dem' (clean <9000, coarsen-mean) or 'lucc' (255->0, coarsen-max)."""
    import numpy as np
    import rioxarray

    da = rioxarray.open_rasterio(tif_path, chunks={"x": 4096, "y": 4096}).squeeze()
    if kind == "dem":
        da = da.where(da < 9000)                 # reference :20-27
        coarse = da.coarsen(x=coarsen, y=coarsen, boundary="trim").mean()
    elif kind == "lucc":
        da = da.where(da != 255, 0)              # reference :33-39
        coarse = da.coarsen(x=coarsen, y=coarsen, boundary="trim").max()
    else:
        raise ValueError(kind)

    arr = coarse.values.astype(np.float32 if kind == "dem" else np.int32)
    np.save(out_prefix + ".npy", arr)
    np.save(out_prefix + "_lon.npy", coarse.x.values)
    np.save(out_prefix + "_lat.npy", coarse.y.values)
    print(f"saved {out_prefix}.npy {arr.shape}")
    return arr


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dem", help="30m DEM GeoTIFF path")
    p.add_argument("--lucc", help="30m LUCC GeoTIFF path template with {year}")
    p.add_argument("--out-dir", default="data/processed/static_features_1km")
    p.add_argument("--start-year", type=int, default=2012)
    p.add_argument("--end-year", type=int, default=2021)
    p.add_argument("--coarsen", type=int, default=33)
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    if args.dem:
        convert_tif_to_npy(args.dem, os.path.join(args.out_dir, "dem_1km"),
                           "dem", args.coarsen)
    if args.lucc:
        for year in range(args.start_year, args.end_year + 1):
            convert_tif_to_npy(args.lucc.format(year=year),
                               os.path.join(args.out_dir, f"lucc_1km_{year}"),
                               "lucc", args.coarsen)


if __name__ == "__main__":
    main()
