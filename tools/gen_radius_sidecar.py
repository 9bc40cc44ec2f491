"""Materialize the radius_search_sites output as a pinned parquet sidecar.

Haversine needs trig, and JVM vs DuckDB/libm transcendentals can differ
in the last ulp (NOTES.md gotchas), so the DuckDB oracle for
`radius_search_sites` reads this pinned twin instead.  The sidecar is
produced by running the REAL Spark query (band prefilter + broadcast
join included), so the oracle is bit-identical to the engine by
construction; tests/test_geo.py independently verifies counts EXACTLY
and distances allclose against a numpy brute force with NO prefilter,
so the sidecar cannot drift from great-circle semantics (and the
latitude-band prefilter is proven lossless) — the ipp_slant pattern.

Usage: python tools/gen_radius_sidecar.py
"""

from __future__ import annotations

import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/ionex_spark/data/radius_golden.parquet"


def main() -> None:
    from ionex_spark.plans.queries_ref import radius_search_sites
    from ionex_spark.session import get_spark

    spark = get_spark("gen-radius-sidecar")
    pdf = (
        radius_search_sites(spark, "/root/testdata/sf0.01")
        .toPandas()
        .sort_values("qid")
        .reset_index(drop=True)
    )
    assert len(pdf) > 50, len(pdf)
    assert (pdf["nearest_km"] <= 500.0).all()
    assert (pdf["n_within"] >= 1).all()
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    pq.write_table(tbl, OUT)
    print(f"wrote {len(pdf)} rows -> {OUT}")


if __name__ == "__main__":
    main()
