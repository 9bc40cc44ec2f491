"""Point-in-polygon joins — crossing-number test with JVM built-ins.

The reference's containment predicate is the geo crate's ``Contains`` on a
Rect (src/cell/mod.rs:307-309) and polygon-ROI reduction goes through a
bounding rect (src/lib.rs:621-656).  Per north_rule the engine supports
true polygon PIP joins.  Two implementations:

1. ``pip_edges_join`` — the polygon set is flattened to an EDGE TABLE
   (poly_id, x1, y1, x2, y2) and broadcast; a point crosses an edge when
   the horizontal ray east of the point intersects it; odd crossing count
   per (point, polygon) = inside.  100% built-in expressions -> whole-stage
   codegen, no Python.  Cost O(|points| * |edges|) — right for polygon sets
   up to ~10^3 edges (broadcastable); the fan-out join is a broadcast
   nested-loop, no shuffle; the parity aggregation shuffles on point id.

2. ``pip_winding_udf`` — vectorized numpy winding test inside a pandas UDF
   for LARGE rings (keeps the per-point cost linear in ring size without a
   row explosion).  Used by tests as a cross-check of (1).

Edge semantics: half-open vertical interval (y1 <= py < y2 in either
orientation) — boundary points on a horizontal edge are outside, points on
a left vertical edge are inside; consistent between both implementations.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import BooleanType


def edges_from_rings(rings: Iterable[dict]) -> list[tuple]:
    """[{poly_id, ring:[(x,y)..closed], lon_shifted?}] -> edge rows
    (poly_id, x1, y1, x2, y2, shifted).

    ``lon_shifted`` rings cross the antimeridian and are stored with
    longitudes in [0, 360) east of Greenwich (e.g. 170..190); the point
    side shifts negative longitudes by +360 for those polygons only."""
    rows = []
    for poly in rings:
        ring = poly["ring"]
        shifted = 1 if poly.get("lon_shifted") else 0
        for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
            rows.append(
                (poly["poly_id"], float(x1), float(y1), float(x2),
                 float(y2), shifted)
            )
    return rows


def edges_df(spark: SparkSession, rings: Iterable[dict]) -> DataFrame:
    return spark.createDataFrame(
        edges_from_rings(rings),
        "poly_id string, x1 double, y1 double, x2 double, y2 double,"
        " shifted int",
    )


CROSSING_COND = (
    "((y1 <= {py} and {py} < y2) or (y2 <= {py} and {py} < y1))"
    " and (CASE WHEN shifted = 1 AND {px} < cast(0.0 as double)"
    " THEN {px} + cast(360.0 as double) ELSE {px} END)"
    " < x1 + ({py} - y1) * (x2 - x1) / (y2 - y1)"
)


def pip_edges_join(
    points: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    x: str = "lon",
    y: str = "lat",
) -> DataFrame:
    """(point, poly_id) rows for every polygon containing the point."""
    cond = F.expr(CROSSING_COND.format(px=x, py=y))
    j = points.join(F.broadcast(edges), cond, "inner")
    return (
        j.groupBy(id_col, "poly_id")
        .agg(F.count(F.lit(1)).alias("crossings"))
        .filter(F.expr("crossings % 2 = 1"))
        .select(id_col, "poly_id")
    )


def pip_winding_udf(rings: list[dict]):
    """Returns a pandas UDF (x, y) -> inside-any-polygon bool for large rings;
    the rings are captured in the closure (broadcast via task pickling)."""
    edges = [
        (
            np.array(
                [
                    (x1, y1, x2, y2)
                    for _, x1, y1, x2, y2, _s in edges_from_rings([poly])
                ]
            ),
            bool(poly.get("lon_shifted")),
        )
        for poly in rings
    ]

    @F.pandas_udf(BooleanType())
    def inside_any(xs: pd.Series, ys: pd.Series) -> pd.Series:
        px0 = xs.to_numpy(np.float64)[:, None]
        py = ys.to_numpy(np.float64)[:, None]
        result = np.zeros(len(px0), dtype=bool)
        for e, shifted in edges:
            px = np.where(shifted & (px0 < 0.0), px0 + 360.0, px0)
            x1, y1, x2, y2 = e[:, 0], e[:, 1], e[:, 2], e[:, 3]
            spans = ((y1 <= py) & (py < y2)) | ((y2 <= py) & (py < y1))
            with np.errstate(divide="ignore", invalid="ignore"):
                xc = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            crossings = (spans & (px < xc)).sum(axis=1)
            result |= (crossings % 2) == 1
        return pd.Series(result)

    return inside_any
