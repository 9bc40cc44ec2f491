"""Materialize the cell_geodesic_metrics oracle sidecar from the
INDEPENDENT numpy twin (core/geodesic.py) — no Spark involved.

The geodesic kernel is an iterative RK4/quadrature solve that plain SQL
cannot reproduce, so the DuckDB oracle for `cell_geodesic_metrics` reads
this pinned 5,040-row parquet twin.  Round-3 advice: the previous
generator ran the Spark query itself, making the oracle row circular
(it only proved determinism).  This version enumerates the slot-0 cell
dimension directly and calls the numpy kernels — the same independence
pattern as tools/gen_ipp_sidecar.py — so the driver's gate row now
compares the Spark mapInPandas path against a separately-computed twin.
tests/test_geodesic.py additionally pins the reference golden constants
(/root/reference/src/cell/mod.rs:855-859) so neither side can drift from
reference semantics unnoticed.

Usage: python tools/gen_geodesic_sidecar.py
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/ionex_spark/data/geodesic_golden.parquet"


def main() -> None:
    from ionex_spark.core import geodesic as g
    from ionex_spark.functions.sqlgen import GRID

    # the slot-0 cell dimension build_tec_cells exposes: every SW corner
    # (lat_i, lon_i) with a NE neighbor -> (nlat-1) x (nlon-1) cells
    lat_i, lon_i = np.meshgrid(
        np.arange(GRID.nlat - 1), np.arange(GRID.nlon - 1), indexing="ij"
    )
    lat_i, lon_i = lat_i.ravel(), lon_i.ravel()
    lat0 = GRID.lat0 + lat_i * GRID.dlat
    lon0 = GRID.lon0 + lon_i * GRID.dlon
    pdf = pd.DataFrame(
        {
            "lat_i": lat_i.astype(np.int64),
            "lon_i": lon_i.astype(np.int64),
            "perimeter_m": g.rect_geodesic_perimeter(
                lon0, lat0, lon0 + GRID.dlon, lat0 + GRID.dlat
            ),
            "area_m2": g.rect_geodesic_area(
                lon0, lat0, lon0 + GRID.dlon, lat0 + GRID.dlat
            ),
        }
    ).sort_values(["lat_i", "lon_i"]).reset_index(drop=True)
    assert len(pdf) == 5040, len(pdf)
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    pq.write_table(tbl, OUT)
    print(f"wrote {len(pdf)} rows -> {OUT} (pure numpy, no Spark)")


if __name__ == "__main__":
    main()
