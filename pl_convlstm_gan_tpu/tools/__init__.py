"""Offline ETL + analysis tools (host-side, framework-neutral).

Ports of the reference's ``src/scripts`` pipeline (SURVEY.md §2 rows 14-18, §3.5):
- ``cmorph``             hourly CMORPH NetCDF -> basin-masked daily precipitation npy
- ``dem_lucc_to_npy``    30 m GeoTIFF -> 1 km DEM/LUCC npy grids
- ``merge_multiyear``    concat per-year rain npys; stack per-year LUCC
- ``compare_station``    gauge-vs-satellite per-station metrics CLI
- ``station``            station Excel/CSV reader helpers

The heavy geo deps (xarray, rioxarray, regionmask, geopandas) are imported lazily —
these tools run in an analysis environment, not on the TPU host."""
