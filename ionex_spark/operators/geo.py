"""Great-circle (haversine) distance ops: radius search around site
points.

The reference's spatial predicates are planar lat/lon (Rect containment,
src/cell/mod.rs:296-309); per the north_star the engine generalizes to
geodesic point queries.  Haversine on the IUGG mean sphere — consistent
with operators/ipp.py's spherical shell — is the standard
warehouse-scale choice (the ellipsoidal refinement lives in
core/geodesic.py for area/perimeter where it matters).

Scale shape for radius_search at 100 TB:
- the site table is small (monitoring stations, POIs) -> broadcast;
- the prefilter is the PROVABLY SAFE latitude band: on the sphere,
  distance >= 111.195 km * dlat_deg, so |dlat| > R/111.195 cannot be a
  hit — the corpus side is filtered inside the broadcast nested-loop
  join before any trig runs, and never shuffles;
- the exact haversine + radius test run in whole-stage codegen on the
  ~R/20000km-fraction of pairs that survive;
- only the per-site rollup exchanges (keyed by site id: tiny).
A longitude band would shrink candidates further but is latitude-
dependent (degenerates at the poles); the asin lower bound needed to
keep it exact costs the same trig it saves, so it is deliberately left
out.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

R_MEAN_KM = 6371.0088  # IUGG mean Earth radius
KM_PER_DEG_LAT = np.pi / 180.0 * R_MEAN_KM  # 111.195... exact on the sphere


def haversine_km_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Spherical haversine distance in km as a JVM expression.  sin^2 of
    the half-angle is 360-degree periodic, so no longitude wrap handling
    is needed."""
    return (
        f"(2.0 * {R_MEAN_KM!r} * asin(sqrt("
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2.0), 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * pow(sin(radians(({lon2}) - ({lon1})) / 2.0), 2))))"
    )


def haversine_km_numpy(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Vectorized numpy twin (the pytest oracle)."""
    la1, lo1, la2, lo2 = (
        np.radians(np.asarray(a, dtype=np.float64))
        for a in (lat1, lon1, lat2, lon2)
    )
    a = (
        np.sin((la2 - la1) / 2.0) ** 2
        + np.cos(la1) * np.cos(la2) * np.sin((lo2 - lo1) / 2.0) ** 2
    )
    return 2.0 * R_MEAN_KM * np.arcsin(np.sqrt(a))


def radius_search(
    points: DataFrame,
    sites: DataFrame,
    radius_km: float,
    id_col: str = "id",
    site_id_col: str = "qid",
    lat: str = "lat",
    lon: str = "lon",
    site_lat: str = "q_lat",
    site_lon: str = "q_lon",
) -> DataFrame:
    """All points within ``radius_km`` great-circle km of each site,
    rolled up per site: (qid, n_within, nearest_id, nearest_km).
    Point rows whose id equals the site id are excluded (self-match).
    nearest_id breaks exact distance ties by the smaller point id, so
    the result is deterministic."""
    band_deg = radius_km / KM_PER_DEG_LAT * 1.0000001  # safety ulps
    dist = haversine_km_sql(site_lat, site_lon, lat, lon)
    j = points.join(
        F.broadcast(sites),
        F.expr(
            f"abs(({lat}) - ({site_lat})) <= {band_deg!r}"
            f" and {id_col} != {site_id_col}"
        ),
        "inner",
    ).withColumn("dist_km", F.expr(dist))
    hits = j.filter(F.col("dist_km") <= radius_km)
    return hits.groupBy(site_id_col).agg(
        F.count(F.lit(1)).alias("n_within"),
        F.expr(f"min_by({id_col}, struct(dist_km, {id_col}))").alias(
            "nearest_id"
        ),
        F.min("dist_km").alias("nearest_km"),
    )


def nearest_site_assign(
    points: DataFrame,
    sites: DataFrame,
    id_col: str = "id",
    lat: str = "lat",
    lon: str = "lon",
    site_id_col: str = "qid",
    site_lat: str = "q_lat",
    site_lon: str = "q_lon",
) -> DataFrame:
    """VORONOI assignment: each point gets its great-circle-nearest site
    — the "route every image to its closest station/region" op, computed
    as a NARROW per-row argmin fold with ZERO shuffle (the
    similarity.ivf_assign pattern): the site table collapses to one
    sorted array row, broadcasts, and array_max over
    (-dist, -site_id) structs picks (min dist, min site_id) — ties
    break to the smaller site id deterministically.

    Per-row cost is n_sites haversines; for the broadcastable site
    tables this targets (10^2-10^4) that beats shuffling |points| x
    n_sites rows through a window by orders of magnitude at 100 TB.
    Output: points + (site_id_col, dist_km)."""
    s = sites.selectExpr(
        f"{site_id_col} as _sid", f"{site_lat} as _slat",
        f"{site_lon} as _slon",
    )
    arr = s.agg(
        F.expr("sort_array(collect_list(struct(_sid, _slat, _slon)))")
        .alias("_sites")
    ).filter(F.size("_sites") > 0)
    j = points.crossJoin(F.broadcast(arr))
    d = haversine_km_sql(lat, lon, "s._slat", "s._slon")
    best = (
        "array_max(transform(_sites, s -> named_struct("
        f"'negd', -({d}), 'negsid', -s._sid)))"
    )
    return (
        j.withColumn("_best", F.expr(best))
        .selectExpr(
            *points.columns,
            f"-_best.negsid as {site_id_col}",
            "-_best.negd as dist_km",
        )
    )
