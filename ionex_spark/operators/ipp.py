"""Ionosphere pierce point (IPP) + slant factor — BEYOND reference parity.

The reference declares the types but stubs the computation:
IPPCoordinates::to_parameters_model returns all-zero IonosphereParameters
(/root/reference/src/ipp.rs:18-27); this module implements the real
single-layer (thin-shell) model from the public IONEX/GNSS literature
(Schaer et al., "IONEX: The IONosphere Map EXchange Format", 1998):

Given a receiver at geodetic (lat, lon) observing a satellite at
elevation E and azimuth A, with a spherical shell at height h above a
sphere of radius R:

    psi  = pi/2 - E - asin(R/(R+h) * cos(E))        (earth-central angle)
    lat' = asin(sin(lat) cos(psi) + cos(lat) sin(psi) cos(A))
    lon' = lon + atan2(sin(A) sin(psi) cos(lat),
                       cos(psi) - sin(lat) sin(lat'))
    zen' = asin(R/(R+h) * cos(E))                   (zenith at the IPP)
    slant COSZ = 1 / cos(zen')                      (src/mapf.rs CosZ)

lon' uses the atan2 great-circle destination form (not the naive
asin(sin psi sin A / cos lat')): it stays correct when the ray passes
over a pole (high-latitude receivers looking poleward land on the
opposite meridian) and never divides by cos(lat') -> no NaN at the
poles.  The result is wrapped into [-180, 180) so downstream grid
indexing never clamps an antimeridian crossing to the wrong edge cell.

Everything is a vectorized Spark column expression (JVM trig, no Python
in the loop); the numpy twin `ipp_numpy` is the pytest oracle — the
trigonometry is NOT registered as a DuckDB-oracled query because JVM and
libm transcendentals can differ in the last ulp, which the bit-exact
gate would flag (NOTES.md gotchas).

Pipeline use: points (receiver, satellite geometry) -> with_ipp ->
pierce-point lat/lon feed the engine's spatial join / tile assignment,
slant converts vertical TEC (the map value) to slant TEC.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ionex_spark.functions.sqlgen import D

R_EARTH_KM = 6371.0
SHELL_KM = 450.0  # the reference grids' HGT1 (ckmg_grid alt)


def _ipp_exprs(
    lat: str, lon: str, elev: str, azim: str,
    r_km: float = R_EARTH_KM, h_km: float = SHELL_KM,
) -> dict[str, str]:
    """SQL fragments for the thin-shell pierce point (angles in degrees
    in, degrees out, lon wrapped to [-180, 180); slant dimensionless)."""
    pi = D(np.pi)
    ratio = D(r_km / (r_km + h_km))
    la = f"radians(cast({lat} as double))"
    lo = f"radians(cast({lon} as double))"
    el = f"radians(cast({elev} as double))"
    az = f"radians(cast({azim} as double))"
    zen_p = f"asin({ratio} * cos({el}))"
    psi = f"({pi} / 2.0 - {el} - {zen_p})"
    lat_p = (
        f"asin(sin({la}) * cos({psi})"
        f" + cos({la}) * sin({psi}) * cos({az}))"
    )
    # pole-safe great-circle destination longitude (atan2 form)
    lon_p = (
        f"({lo} + atan2(sin({az}) * sin({psi}) * cos({la}),"
        f" cos({psi}) - sin({la}) * sin({lat_p})))"
    )
    lon_deg_wrapped = (
        f"(pmod(degrees({lon_p}) + 180.0, 360.0) - 180.0)"
    )
    return {
        "ipp_lat": f"degrees({lat_p})",
        "ipp_lon": lon_deg_wrapped,
        "slant": f"(1.0 / cos({zen_p}))",
    }


def with_ipp(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    elev: str = "elev",
    azim: str = "azim",
    r_km: float = R_EARTH_KM,
    h_km: float = SHELL_KM,
) -> DataFrame:
    """Append ipp_lat / ipp_lon (degrees) + slant columns — pure JVM
    trig expressions, narrow (no shuffle)."""
    exprs = _ipp_exprs(lat, lon, elev, azim, r_km, h_km)
    return df.withColumns({k: F.expr(v) for k, v in exprs.items()})


def ipp_numpy(
    lat_deg, lon_deg, elev_deg, azim_deg,
    r_km: float = R_EARTH_KM, h_km: float = SHELL_KM,
):
    """Vectorized numpy twin (the pytest oracle)."""
    la = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lo = np.radians(np.asarray(lon_deg, dtype=np.float64))
    el = np.radians(np.asarray(elev_deg, dtype=np.float64))
    az = np.radians(np.asarray(azim_deg, dtype=np.float64))
    ratio = r_km / (r_km + h_km)
    zen_p = np.arcsin(ratio * np.cos(el))
    psi = np.pi / 2.0 - el - zen_p
    lat_p = np.arcsin(
        np.sin(la) * np.cos(psi) + np.cos(la) * np.sin(psi) * np.cos(az)
    )
    lon_p = lo + np.arctan2(
        np.sin(az) * np.sin(psi) * np.cos(la),
        np.cos(psi) - np.sin(la) * np.sin(lat_p),
    )
    return (
        np.degrees(lat_p),
        (np.degrees(lon_p) + 180.0) % 360.0 - 180.0,
        1.0 / np.cos(zen_p),
    )
