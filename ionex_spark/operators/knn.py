"""kNN lookup of grid points — candidate window + ranking (SURVEY.md §2.3).

The reference's nearest-bound analogue is ``Linspace::nearest_lower /
nearest_above`` (src/linspace.rs:163-179); generalized per north_rule to
k-nearest-neighbor search against the TEC grid:

    point -> containing cell (arithmetic) -> 4x4 candidate grid-point
    window (offsets -1..2 on each axis, clamped to the grid) ->
    squared-degree distance -> row_number() <= k per point.

Window-correctness: for a point inside a cell, the 4 nearest grid LINES on
each axis are exactly the offsets {-1, 0, 1, 2} from the cell's SW corner
(offset 3 is dominated by 2, -2 by -1), so the 16-candidate window provably
contains the true top-4 (and in practice top-k for k <= 8 away from edges).

The candidate fan-out is a NARROW explode of a 16-element literal array
(no join at all — asserted in tests/test_plan_invariants.py); the final
ranking is the single shuffle, on the point id — unavoidable for a
per-point top-k, and AQE coalesces it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ionex_spark.functions import sqlgen
from ionex_spark.functions.sqlgen import GRID

OFFSETS = [(di, dj) for di in (-1, 0, 1, 2) for dj in (-1, 0, 1, 2)]


def knn_grid_points(
    points: DataFrame,
    k: int = 4,
    id_col: str = "id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """k nearest TEC-grid points per query point.

    Output: (id, rank, g_lat_i, g_lon_i, g_lat, g_lon, dist2).
    Deterministic total order: (dist2, g_lat_i, g_lon_i) tie-break.
    """
    g = GRID
    p = points.withColumns(
        {
            "lat_i": F.expr(sqlgen.lat_idx_sql(lat)),
            "lon_i": F.expr(sqlgen.lon_idx_sql(lon)),
        }
    )
    # candidate fan-out as a NARROW explode of a 16-element literal array
    # (a crossJoin with a 16-row table would plan a BroadcastNestedLoop
    # join — same output, one more exchange + join operator for nothing)
    offs = F.array(
        *[
            F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
            for di, dj in OFFSETS
        ]
    )
    cand = p.select("*", F.explode(offs).alias("o"))
    # drop (not clamp) out-of-grid candidates: no duplicates, no extra
    # shuffle; edge windows keep >= 3x3 candidates which still provably
    # contain the top-4 for this grid's aspect ratio
    cand = cand.withColumns(
        {"g_lat_i": F.expr("lat_i + o.di"), "g_lon_i": F.expr("lon_i + o.dj")}
    ).filter(
        F.expr(
            f"g_lat_i between 0 and {g.nlat - 1}"
            f" and g_lon_i between 0 and {g.nlon - 1}"
        )
    )
    cand = cand.withColumns(
        {
            "g_lat": F.expr(
                f"({sqlgen.D(g.lat0)} + g_lat_i * {sqlgen.D(g.dlat)})"
            ),
            "g_lon": F.expr(
                f"({sqlgen.D(g.lon0)} + g_lon_i * {sqlgen.D(g.dlon)})"
            ),
        }
    ).withColumn(
        "dist2",
        F.expr(
            f"(({lat}) - g_lat) * (({lat}) - g_lat)"
            f" + (({lon}) - g_lon) * (({lon}) - g_lon)"
        ),
    )
    w = Window.partitionBy(id_col).orderBy("dist2", "g_lat_i", "g_lon_i")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "g_lat_i", "g_lon_i", "g_lat", "g_lon", "dist2")
    )
