"""Thin-shell ionosphere pierce point — Spark exprs vs numpy twin +
physical sanity (the reference stubs this computation, src/ipp.rs:18-27;
model from the public IONEX paper, Schaer et al. 1998)."""

import numpy as np
import pytest

from ionex_spark.operators import ipp

pytestmark = pytest.mark.spark


def test_ipp_matches_numpy_twin(spark):
    n = 500
    df = spark.range(n).selectExpr(
        "cast(id % 171 - 85 as double) as lat",
        "cast((id * 7) % 360 - 180 as double) as lon",
        "cast(5 + (id * 13) % 85 as double) as elev",
        "cast((id * 29) % 360 as double) as azim",
    )
    got = ipp.with_ipp(df).toPandas()
    w_lat, w_lon, w_slant = ipp.ipp_numpy(
        got["lat"], got["lon"], got["elev"], got["azim"]
    )
    np.testing.assert_allclose(got["ipp_lat"], w_lat, atol=1e-9)
    np.testing.assert_allclose(got["ipp_lon"], w_lon, atol=1e-9)
    np.testing.assert_allclose(got["slant"], w_slant, atol=1e-12)


def test_ipp_physics(spark):
    """Zenith observation pierces directly overhead with slant 1; low
    elevation pushes the pierce point hundreds of km toward the satellite
    and slant well above 1."""
    rows = [(45.0, 10.0, 90.0, 0.0), (45.0, 10.0, 10.0, 0.0),
            (0.0, 0.0, 30.0, 90.0)]
    df = spark.createDataFrame(
        rows, "lat double, lon double, elev double, azim double"
    )
    out = {(r.lat, r.elev): r for r in ipp.with_ipp(df).collect()}
    zen = out[(45.0, 90.0)]
    assert abs(zen.ipp_lat - 45.0) < 1e-9
    assert abs(zen.ipp_lon - 10.0) < 1e-9
    assert abs(zen.slant - 1.0) < 1e-12
    low = out[(45.0, 10.0)]
    assert low.ipp_lat > 46.0  # azimuth 0 = due north
    assert low.slant > 2.0
    east = out[(0.0, 30.0)]
    assert east.ipp_lon > 0.5 and abs(east.ipp_lat) < 1e-9


def test_ipp_pole_crossing_and_antimeridian(spark):
    """The atan2 destination form handles rays past the pole (pierce
    point lands on the opposite meridian) and output longitude is wrapped
    to [-180, 180) so antimeridian crossings never clamp to the wrong
    grid edge."""
    rows = [
        (88.0, 10.0, 5.0, 0.0),    # looking due north from near the pole
        (45.0, 179.5, 15.0, 90.0),  # looking east across the dateline
    ]
    df = spark.createDataFrame(
        rows, "lat double, lon double, elev double, azim double"
    )
    out = {r.lat: r for r in ipp.with_ipp(df).collect()}
    polar = out[88.0]
    # past the pole: latitude comes back down, longitude flips ~180 deg
    assert polar.ipp_lat < 88.0
    assert abs(abs(polar.ipp_lon - 10.0) - 180.0) < 1.0
    dateline = out[45.0]
    # ~14.8 deg eastward travel: 179.5 -> -165.7 (wrapped, not clamped)
    assert -180.0 <= dateline.ipp_lon < -160.0
    # and the numpy twin agrees on both exotic cases
    w_lat, w_lon, _ = ipp.ipp_numpy(
        [r[0] for r in rows], [r[1] for r in rows],
        [r[2] for r in rows], [r[3] for r in rows],
    )
    np.testing.assert_allclose(
        [out[88.0].ipp_lat, out[45.0].ipp_lat], w_lat, atol=1e-9
    )
    np.testing.assert_allclose(
        [out[88.0].ipp_lon, out[45.0].ipp_lon], w_lon, atol=1e-9
    )


def test_ipp_feeds_spatial_join(spark):
    """Pierce points flow straight into the engine's tile assignment:
    slant TEC = vertical TEC (map value at the IPP) * slant factor."""
    from pyspark.sql import functions as F

    from ionex_spark.operators import spatial

    pts = spark.range(200).selectExpr(
        "id",
        "cast(id % 120 - 60 as double) as lat",
        "cast((id * 11) % 300 - 150 as double) as lon",
        "cast(15 + id % 70 as double) as elev",
        "cast((id * 37) % 360 as double) as azim",
        "cast(id % 25 as bigint) as slot",
    )
    pierced = ipp.with_ipp(pts).selectExpr(
        "id", "ipp_lat as lat", "ipp_lon as lon", "slot", "slant"
    ).filter("lat between -87.5 and 87.5 and lon between -180 and 180")
    cells = spatial.build_tec_cells(spark)
    out = spatial.spatial_join_bilinear(pierced, cells).withColumn(
        "slant_tec", F.expr("tec * slant")
    )
    pdf = out.select("id", "tec", "slant", "slant_tec").toPandas()
    assert len(pdf) > 0
    np.testing.assert_allclose(
        pdf["slant_tec"], pdf["tec"] * pdf["slant"], rtol=0, atol=0
    )


def test_ipp_sidecar_pinned_to_numpy_twin():
    """The ipp_golden.parquet oracle sidecar (generated from the Spark
    query's own output) must agree with the independent numpy twin on the
    registered sweep geometry — a buggy engine regeneration cannot slip
    through the driver gate unnoticed."""
    import pandas as pd

    pdf = pd.read_parquet("/root/repo/ionex_spark/data/ipp_golden.parquet")
    assert len(pdf) == 2000
    ids = pdf["obs_id"].to_numpy()
    lat = -84.0 + (ids % 57) * 3.0
    lon = -180.0 + (ids % 96) * 3.75
    elev = 5.0 + (ids % 18) * 4.7
    azim = (ids % 73) * 5.0
    w_lat, w_lon, w_slant = ipp.ipp_numpy(lat, lon, elev, azim)
    np.testing.assert_allclose(pdf["ipp_lat"], w_lat, atol=1e-9)
    np.testing.assert_allclose(pdf["ipp_lon"], w_lon, atol=1e-9)
    np.testing.assert_allclose(pdf["slant"], w_slant, atol=1e-12)
