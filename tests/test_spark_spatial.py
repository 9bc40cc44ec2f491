"""Spark spatial operators vs the numpy oracle + reference golden fixtures."""

import numpy as np
import pandas as pd
import pytest

from ionex_spark.core import bilinear, cell_encode, temporal_interp
from ionex_spark.core.synth import tecu_q_int
from ionex_spark.functions import sqlgen
from ionex_spark.functions.sqlgen import GRID
from ionex_spark.operators import spatial

pytestmark = pytest.mark.spark


def make_points(spark, n=500):
    return spark.range(n).selectExpr(
        "id",
        f"{sqlgen.lat_from_id_sql('id')} as lat",
        f"{sqlgen.lon_from_id_sql('id')} as lon",
        f"{sqlgen.slot_from_id_sql('id')} as slot",
        f"{sqlgen.tsec_from_id_sql('id')} as tsec",
    )


def numpy_tec(lat, lon, slot):
    """Oracle: same field + bilinear via core kernels."""
    lat_i = np.clip(
        np.floor((lat - GRID.lat0) / GRID.dlat).astype(int), 0, GRID.nlat - 2
    )
    lon_i = np.clip(
        np.floor((lon - GRID.lon0) / GRID.dlon).astype(int), 0, GRID.nlon - 2
    )
    sw = tecu_q_int(lat_i, lon_i, slot) / 10.0
    se = tecu_q_int(lat_i, lon_i + 1, slot) / 10.0
    nw = tecu_q_int(lat_i + 1, lon_i, slot) / 10.0
    ne = tecu_q_int(lat_i + 1, lon_i + 1, slot) / 10.0
    lat0 = GRID.lat0 + lat_i * GRID.dlat
    lon0 = GRID.lon0 + lon_i * GRID.dlon
    return bilinear(
        lon, lat, lon0, lat0, GRID.dlon, GRID.dlat, sw, se, nw, ne,
        out_of_bounds="none",
    )


def test_spatial_join_matches_numpy_oracle(spark):
    pts = make_points(spark)
    cells = spatial.build_tec_cells(spark)
    out = (
        spatial.spatial_join_bilinear(pts, cells)
        .select("id", "lat", "lon", "slot", "tec")
        .toPandas()
        .sort_values("id")
    )
    assert len(out) == 500  # inner join keeps every point (full grid)
    want = numpy_tec(
        out["lat"].to_numpy(), out["lon"].to_numpy(), out["slot"].to_numpy()
    )
    np.testing.assert_allclose(out["tec"].to_numpy(), want, rtol=0, atol=1e-12)


def test_bilinear_golden_fixtures_through_spark(spark):
    """The reference's unit-cell goldens (src/cell/mod.rs:833-909) pushed
    through the engine's JVM expression."""
    rows = [
        # p, q, sw, se, nw, ne, expected
        (0.5, 0.5, 1.0, 1.0, 1.0, 1.0, 1.0),
        (0.5, 0.5, 1.0, 0.0, 0.0, 0.0, 0.25),
        (0.1, 0.1, 1.0, 0.0, 0.0, 0.0, 0.81),
        (0.01, 0.01, 1.0, 0.0, 0.0, 0.0, 0.9801),
        (0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "p double, q double, sw double, se double, nw double, ne double, want double"
    )
    got = df.selectExpr(
        f"{sqlgen.bilinear_sql('p', 'q', 'sw', 'se', 'nw', 'ne')} as tec",
        "want",
    ).toPandas()
    np.testing.assert_allclose(got["tec"], got["want"], atol=1e-12)


def test_temporal_join_matches_numpy_oracle(spark):
    pts = make_points(spark)
    cells = spatial.build_tec_cells(spark)
    out = (
        spatial.temporal_spatial_join(pts, cells)
        .select("id", "lat", "lon", "tsec", "tec")
        .toPandas()
        .sort_values("id")
    )
    assert len(out) == 500
    lat, lon = out["lat"].to_numpy(), out["lon"].to_numpy()
    t = out["tsec"].to_numpy().astype(float)
    s0 = np.floor(t / 3600).astype(int)
    v0 = numpy_tec(lat, lon, s0)
    v1 = numpy_tec(lat, lon, s0 + 1)
    want = temporal_interp(t, s0 * 3600.0, (s0 + 1) * 3600.0, v0, v1)
    np.testing.assert_allclose(out["tec"].to_numpy(), want, atol=1e-12)


def test_temporal_weight_zero_at_map_epoch(spark):
    """w=0 exactness at aligned epochs (SURVEY.md §2.8 temporal notes)."""
    df = spark.createDataFrame([(7200,)], "tsec bigint")
    got = df.selectExpr(
        f"{sqlgen.bracket_slot0_sql('tsec')} as s0",
        f"{sqlgen.bracket_w1_sql('tsec')} as w1",
    ).first()
    assert got.s0 == 2 and got.w1 == 0.0


def test_cell_id_expr_matches_numpy(spark):
    pts = make_points(spark, 300)
    for res in (0, 4, 9):
        got = (
            pts.selectExpr(
                "id", "lat", "lon",
                f"{sqlgen.cell_id_sql('lat', 'lon', res)} as cell",
            )
            .toPandas()
            .sort_values("id")
        )
        want = cell_encode(got["lat"].to_numpy(), got["lon"].to_numpy(), res)
        np.testing.assert_array_equal(got["cell"].to_numpy(), want)


def test_cell_parent_expr_matches_numpy(spark):
    from ionex_spark.core import cell_parent

    pts = make_points(spark, 200)
    got = (
        pts.selectExpr(
            "id",
            f"{sqlgen.cell_id_sql('lat', 'lon', 9)} as c9",
            f"{sqlgen.cell_parent_sql(sqlgen.cell_id_sql('lat', 'lon', 9), 9, 3)} as c3",
        )
        .toPandas()
        .sort_values("id")
    )
    np.testing.assert_array_equal(
        got["c3"].to_numpy(), cell_parent(got["c9"].to_numpy(), 3)
    )


def test_grid_edge_clamping(spark):
    """Points beyond the lat grid edge clamp into the boundary cell
    (worldwide wrap/clamp semantics, SURVEY.md §2.8)."""
    df = spark.createDataFrame(
        [(89.0, 0.0), (-89.0, 0.0), (0.0, 179.99), (0.0, -180.0)],
        "lat double, lon double",
    )
    got = spatial.with_cell_index(df).toPandas()
    assert got["lat_i"].tolist() == [69, 0, 35, 35]
    assert got["lon_i"].tolist() == [36, 36, 71, 0]


def test_plan_is_broadcast_and_shuffle_free(spark):
    """The flagship join must broadcast the grid side and contain NO
    shuffle exchange — the 100 TB design invariant (SURVEY.md §4.2)."""
    pts = make_points(spark)
    cells = spatial.build_tec_cells(spark)
    plan = (
        spatial.spatial_join_bilinear(pts, cells)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "ShuffleExchange" not in plan.replace("BroadcastExchange", "")
    assert "Exchange hashpartitioning" not in plan


def test_temporal_irregular_boundary_and_midpoint(spark):
    """End-to-end irregular-axis interpolation: a point exactly AT an
    irregular map epoch gets w1 = 0 and the aligned bilinear value; a
    mid-interval point gets the exact linear combine of the two bracket
    maps."""
    from ionex_spark.operators import spatial

    epochs = spark.range(13).selectExpr("id * id * 600 as esec", "id as slot")
    cells = spatial.build_tec_cells(spark, n_slots=13)
    pts = spark.createDataFrame(
        [
            (0, 12.3, 45.6, 4 * 4 * 600),          # exactly at slot 4
            (1, -33.0, 100.25, 86400),             # final epoch (t == t1)
            (2, 12.3, 45.6, (4 * 4 * 600 + 5 * 5 * 600) // 2),  # midpoint
        ],
        "id bigint, lat double, lon double, tsec bigint",
    )
    out = {
        r.id: r
        for r in spatial.temporal_spatial_join_irregular(
            pts, cells, epochs
        ).collect()
    }
    assert out[0].w1 == 0.0 and out[0].slot0 == 4
    assert out[1].w1 == 1.0 and out[1].slot0 == 11  # accepted at tmax
    aligned = {
        r.id: r.tec
        for r in spatial.spatial_join_bilinear(
            spark.createDataFrame(
                [(0, 12.3, 45.6, 4), (1, -33.0, 100.25, 12),
                 (4, 12.3, 45.6, 5)],
                "id bigint, lat double, lon double, slot bigint",
            ),
            cells,
        ).collect()
    }
    assert out[0].tec == aligned[0]
    assert out[1].tec == aligned[1]
    assert out[2].tec == 0.5 * aligned[0] + 0.5 * aligned[4]


# ------------------------------------------------------- gap filling

def test_gap_fill_series_hand_computed(spark):
    from ionex_spark.operators.spatial import gap_fill_series

    # key A: values at slots 1,4 (leading gap 0; interior gaps 2,3 filled
    # by interpolation; trailing gap absent with n_slots=5)
    # key B: full series, passes through unchanged
    sparse = spark.createDataFrame(
        [
            ("A", 1, 10.0), ("A", 4, 40.0),
            ("B", 0, 1.0), ("B", 1, 2.0), ("B", 2, 3.0),
            ("B", 3, 4.0), ("B", 4, 5.0),
        ],
        "k string, slot int, tecu double",
    )
    got = (
        gap_fill_series(sparse, 5, keys=["k"])
        .toPandas()
        .set_index(["k", "slot"])
        .sort_index()
    )
    a = got.loc["A"]
    # leading slot 0 has no left bracket -> absent
    assert list(a.index) == [1, 2, 3, 4]
    assert a.loc[2, "tecu_filled"] == 20.0
    assert a.loc[3, "tecu_filled"] == 30.0
    assert a.loc[2, "was_gap"] == 1 and a.loc[1, "was_gap"] == 0
    b = got.loc["B"]
    assert list(b["tecu_filled"]) == [1.0, 2.0, 3.0, 4.0, 5.0]
    assert (b["was_gap"] == 0).all()


# ----------------------------------------- trilinear altitude interp

def test_trilinear_matches_independent_numpy(spark):
    """Independent evidence for the alt_interp family (the gate oracle
    shares sqlgen fragments with the engine, so a fragment bug would
    pass bit-exact — the round-3 median lesson): recompute the full
    trilinear pipeline in plain numpy from the spec constants, never
    touching sqlgen."""
    import numpy as np

    from ionex_spark.functions import sqlgen
    from ionex_spark.operators import spatial

    ids = np.arange(1, 400, 7, dtype=np.int64)
    pts = spark.createDataFrame(
        [(int(i),) for i in ids], "id bigint"
    ).selectExpr(
        "id",
        f"{sqlgen.lat_from_id_sql('id')} as lat",
        f"{sqlgen.lon_from_id_sql('id')} as lon",
        f"{sqlgen.alt_from_id_sql('id')} as alt",
        f"{sqlgen.slot_from_id_sql('id')} as slot",
    )
    got = (
        spatial.trilinear_join(pts, spatial.build_tec_cells_3d(spark))
        .select("id", "tec")
        .toPandas()
        .set_index("id")["tec"]
    )

    # --- independent numpy twin (spec constants only, no sqlgen) ---
    lat = -87.5 + ((ids * 7919) % 1751) / 10.0
    lon = -180.0 + ((ids * 104729) % 3600) / 10.0
    alt = 200.0 + ((ids * 7907) % 2000) / 10.0
    slot = (ids * 2654435761) % 25
    lat_i = np.clip(np.floor((lat + 87.5) / 2.5).astype(np.int64), 0, 69)
    lon_i = np.clip(np.floor((lon + 180.0) / 5.0).astype(np.int64), 0, 71)
    alt_i = np.clip(np.floor((alt - 200.0) / 50.0).astype(np.int64), 0, 3)

    def field(la, lo, ai, sl):
        return (((la * 31 + lo * 17 + ai * 7 + sl * 13) % 500) + 10) / 10.0

    p = (lat - (-87.5 + lat_i * 2.5)) / 2.5
    q = (lon - (-180.0 + lon_i * 5.0)) / 5.0
    r = (alt - (200.0 + alt_i * 50.0)) / 50.0
    want = np.zeros(len(ids))
    for w_r, ai in (((1 - r), alt_i), (r, alt_i + 1)):
        bil = (
            (1 - p) * (1 - q) * field(lat_i, lon_i, ai, slot)
            + p * (1 - q) * field(lat_i, lon_i + 1, ai, slot)
            + q * (1 - p) * field(lat_i + 1, lon_i, ai, slot)
            + p * q * field(lat_i + 1, lon_i + 1, ai, slot)
        )
        want = want + w_r * bil
    assert len(got) == len(ids)
    np.testing.assert_allclose(got.loc[ids].to_numpy(), want, rtol=1e-12)


def test_trilinear_plane_exactness_and_clamp(spark):
    """At a height plane exactly (r=0 or the clamped top), trilinear
    equals the plane's bilinear; hand-computed corner case."""
    from ionex_spark.operators import spatial

    # point exactly on plane alt=250 (alt_i=1, r=0) at a grid node
    pts = spark.createDataFrame(
        [(1, -87.5, -180.0, 250.0, 0), (2, -87.5, -180.0, 400.0, 0)],
        "id bigint, lat double, lon double, alt double, slot bigint",
    )
    got = (
        spatial.trilinear_join(pts, spatial.build_tec_cells_3d(spark, n_slots=1))
        .select("id", "alt_i", "tec")
        .toPandas()
        .set_index("id")
    )
    # node (0,0) plane 1: ((0*31+0*17+1*7+0*13)%500+10)/10 = 1.7
    assert got.loc[1, "tec"] == 1.7
    assert got.loc[1, "alt_i"] == 1
    # alt=400 = top plane: alt_i clamps to nh-2=3, r=1 -> plane-4 value
    # ((4*7)%500+10)/10 = 3.8
    assert got.loc[2, "alt_i"] == 3
    assert abs(got.loc[2, "tec"] - 3.8) < 1e-12
