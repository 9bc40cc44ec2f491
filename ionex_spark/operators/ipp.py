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
    lon' = lon + asin(sin(psi) sin(A) / cos(lat'))
    zen' = asin(R/(R+h) * cos(E))                   (zenith at the IPP)
    slant COSZ = 1 / cos(zen')                      (src/mapf.rs CosZ)

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

_DEG = "(cast({x} as double) * {pi} / 180.0)"


def _ipp_exprs(
    lat: str, lon: str, elev: str, azim: str,
    r_km: float = R_EARTH_KM, h_km: float = SHELL_KM,
) -> dict[str, str]:
    """SQL fragments for the thin-shell pierce point (angles in degrees
    in, degrees out; slant dimensionless)."""
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
    lon_p = f"({lo} + asin(sin({psi}) * sin({az}) / cos({lat_p})))"
    return {
        "ipp_lat": f"degrees({lat_p})",
        "ipp_lon": f"degrees({lon_p})",
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
    lon_p = lo + np.arcsin(np.sin(psi) * np.sin(az) / np.cos(lat_p))
    return (
        np.degrees(lat_p),
        np.degrees(lon_p),
        1.0 / np.cos(zen_p),
    )
