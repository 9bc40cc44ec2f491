"""ROI reduction — regional/worldwide IONEX conversions.

Mirrors the reference's secondary entry points (SURVEY.md §3.4):
- ``to_regional`` = to_regional_ionex(polygon) (src/lib.rs:621-656):
  polygon -> bounding rect -> keep only FULLY CONTAINED cells -> rebuild
  the header grid bounds from the kept cells.  In the engine the record
  side is a rect filter over ``tec_points`` (cells whose 4 corners lie in
  the rect == grid points in the closed rect for a regular grid).
- ``to_worldwide`` = to_worldwide_ionex (src/lib.rs:583-599): header
  bounds rewrite only; the record is untouched (faithfully mirrored,
  quirk included).
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame, functions as F

from ionex_spark.core.ionex_io import IonexHeader
from ionex_spark.core.linspace import Grid, Linspace


def to_regional(
    tec_points: DataFrame,
    header: IonexHeader,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
) -> tuple[DataFrame, IonexHeader]:
    """Keep grid points inside the closed rect; shrink header bounds to
    the kept grid lines (snapped outward-in to the grid)."""
    df = tec_points.filter(
        (F.col("lat") >= lat_min) & (F.col("lat") <= lat_max)
        & (F.col("lon") >= lon_min) & (F.col("lon") <= lon_max)
    )
    g = header.grid
    lat_asc = g.lat.ascending()
    lon_asc = g.lon.ascending()
    import math

    def snap_up(lo, start, step):
        return start + math.ceil(round((lo - start) / step, 9)) * step

    def snap_down(hi, start, step):
        return start + math.floor(round((hi - start) / step, 9)) * step

    new_lat = Linspace(
        snap_up(lat_min, lat_asc.start, lat_asc.spacing),
        snap_down(lat_max, lat_asc.start, lat_asc.spacing),
        lat_asc.spacing,
    )
    new_lon = Linspace(
        snap_up(lon_min, lon_asc.start, lon_asc.spacing),
        snap_down(lon_max, lon_asc.start, lon_asc.spacing),
        lon_asc.spacing,
    )
    # preserve the original axis orientation (IONEX lat is often N->S)
    if g.lat.spacing < 0:
        new_lat = Linspace(new_lat.end, new_lat.start, g.lat.spacing)
    if g.lon.spacing < 0:
        new_lon = Linspace(new_lon.end, new_lon.start, g.lon.spacing)
    new_header = replace(
        header, grid=Grid(lat=new_lat, lon=new_lon, alt=g.alt)
    )
    return df, new_header


def to_worldwide(header: IonexHeader) -> IonexHeader:
    """Header-bounds rewrite only (record untouched — reference behavior,
    src/lib.rs:583-599)."""
    g = header.grid
    lat = Linspace(87.5, -87.5, -abs(g.lat.spacing)) if g.lat.spacing < 0 \
        else Linspace(-87.5, 87.5, abs(g.lat.spacing))
    lon = Linspace(-180.0, 180.0, abs(g.lon.spacing)) if g.lon.spacing > 0 \
        else Linspace(180.0, -180.0, -abs(g.lon.spacing))
    return replace(header, grid=Grid(lat=lat, lon=lon, alt=g.alt))
