"""Haversine radius search vs an unfiltered numpy brute force.

Proves (1) the JVM haversine expression matches the numpy twin to float
tolerance, and (2) the latitude-band prefilter in geo.radius_search
loses no hits — the brute force applies NO prefilter.
"""

import numpy as np
import pytest

from ionex_spark.functions import sqlgen
from ionex_spark.operators import geo

pytestmark = pytest.mark.spark

N, RADIUS = 3000, 750.0


def _pts(spark, n=N):
    return spark.range(n).selectExpr(
        "id",
        f"{sqlgen.lat_from_id_sql('id')} as lat",
        f"{sqlgen.lon_from_id_sql('id')} as lon",
    )


def test_radius_search_matches_unfiltered_brute_force(spark):
    pts = _pts(spark)
    sites = pts.filter("id % 53 = 0").selectExpr(
        "id as qid", "lat as q_lat", "lon as q_lon"
    )
    got = (
        geo.radius_search(pts, sites, radius_km=RADIUS)
        .toPandas()
        .set_index("qid")
        .sort_index()
    )

    pdf = pts.toPandas()
    lat, lon, ids = (
        pdf["lat"].to_numpy(), pdf["lon"].to_numpy(),
        pdf["id"].to_numpy(),
    )
    want = {}
    for qid in ids[ids % 53 == 0]:
        q = pdf[pdf["id"] == qid].iloc[0]
        d = geo.haversine_km_numpy(
            np.full_like(lat, q["lat"]), np.full_like(lon, q["lon"]),
            lat, lon,
        )
        mask = (d <= RADIUS) & (ids != qid)
        if mask.any():
            order = np.lexsort((ids[mask], d[mask]))
            want[qid] = (
                int(mask.sum()),
                int(ids[mask][order[0]]),
                float(d[mask].min()),
            )

    assert set(got.index) == set(want)
    for qid, (n_within, nearest_id, nearest_km) in want.items():
        # counts exact: a last-ulp JVM/numpy divergence flipping the
        # <= RADIUS comparison would show here — none ever has
        assert got.loc[qid, "n_within"] == n_within, qid
        assert got.loc[qid, "nearest_id"] == nearest_id, qid
        assert got.loc[qid, "nearest_km"] == pytest.approx(
            nearest_km, abs=1e-9
        ), qid


def test_haversine_known_distances(spark):
    # meridian arc: 1 degree of latitude = pi/180 * R ~ 111.195 km
    one_deg = float(
        spark.range(1).selectExpr(
            geo.haversine_km_sql("0.0", "0.0", "1.0", "0.0") + " as d"
        ).first().d
    )
    assert one_deg == pytest.approx(np.pi / 180.0 * geo.R_MEAN_KM, rel=1e-12)
    # antimeridian wrap: (0, 179.5) to (0, -179.5) is 1 degree, not 359
    wrap = float(
        spark.range(1).selectExpr(
            geo.haversine_km_sql("0.0", "179.5", "0.0", "-179.5") + " as d"
        ).first().d
    )
    assert wrap == pytest.approx(one_deg, rel=1e-9)
    # antipodes: half the great circle
    anti = float(
        spark.range(1).selectExpr(
            geo.haversine_km_sql("0.0", "0.0", "0.0", "180.0") + " as d"
        ).first().d
    )
    assert anti == pytest.approx(np.pi * geo.R_MEAN_KM, rel=1e-12)


def test_nearest_site_assign_matches_numpy_argmin(spark):
    pts = _pts(spark, 800)
    sites = pts.filter("id % 61 = 0").selectExpr(
        "id as qid", "lat as q_lat", "lon as q_lon"
    )
    got = (
        geo.nearest_site_assign(pts, sites)
        .toPandas()
        .set_index("id")
        .sort_index()
    )
    pdf = pts.toPandas()
    spdf = pdf[pdf["id"] % 61 == 0]
    for _, row in pdf.iterrows():
        d = geo.haversine_km_numpy(
            np.full(len(spdf), row["lat"]), np.full(len(spdf), row["lon"]),
            spdf["lat"].to_numpy(), spdf["lon"].to_numpy(),
        )
        order = np.lexsort((spdf["id"].to_numpy(), d))
        want_sid = int(spdf["id"].to_numpy()[order[0]])
        assert got.loc[row["id"], "qid"] == want_sid, row["id"]
        assert got.loc[row["id"], "dist_km"] == pytest.approx(
            float(d.min()), abs=1e-9
        )
