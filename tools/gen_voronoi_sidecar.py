"""Materialize the voronoi_site_rollup output as a pinned parquet
sidecar (haversine trig -> no bit-exact SQL twin possible; the
independent check is tests/test_geo.py's numpy argmin equality).

Usage: python tools/gen_voronoi_sidecar.py
"""

from __future__ import annotations

import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/ionex_spark/data/voronoi_golden.parquet"


def main() -> None:
    from ionex_spark.plans.queries_ref import voronoi_site_rollup
    from ionex_spark.session import get_spark

    spark = get_spark("gen-voronoi-sidecar")
    pdf = (
        voronoi_site_rollup(spark, "/root/testdata/sf0.01")
        .toPandas()
        .sort_values("qid")
        .reset_index(drop=True)
    )
    assert pdf["n_points"].sum() == 20000, pdf["n_points"].sum()
    assert (pdf["min_km"] >= 0).all()
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    pq.write_table(tbl, OUT)
    print(f"wrote {len(pdf)} rows -> {OUT}")


if __name__ == "__main__":
    main()
