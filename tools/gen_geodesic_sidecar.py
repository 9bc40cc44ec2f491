"""Materialize the cell_geodesic_metrics output as a parquet sidecar.

The geodesic kernel (core/geodesic.py) is an iterative RK4/quadrature
solve that plain SQL cannot reproduce, so the DuckDB oracle for
`cell_geodesic_metrics` reads this pinned 5,040-row twin instead.  The
sidecar is produced by running the REAL Spark query (mapInPandas path
included), so the oracle is bit-identical to the engine by construction;
tests/test_geodesic.py independently pins the reference golden constants
(/root/reference/src/cell/mod.rs:855-859) so the sidecar cannot drift
from the reference semantics unnoticed.

Usage: python tools/gen_geodesic_sidecar.py
"""

from __future__ import annotations

import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/ionex_spark/data/geodesic_golden.parquet"


def main() -> None:
    from ionex_spark.plans.queries_ref import cell_geodesic_metrics
    from ionex_spark.session import get_spark

    spark = get_spark("gen-geodesic-sidecar")
    pdf = (
        cell_geodesic_metrics(spark, "/root/testdata/sf0.001")
        .toPandas()
        .sort_values(["lat_i", "lon_i"])
        .reset_index(drop=True)
    )
    assert len(pdf) == 5040, len(pdf)
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    pq.write_table(tbl, OUT)
    print(f"wrote {len(pdf)} rows -> {OUT}")


if __name__ == "__main__":
    main()
