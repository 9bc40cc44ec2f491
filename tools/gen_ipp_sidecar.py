"""Materialize the ipp_slant output as a pinned parquet sidecar.

The pierce-point trigonometry (operators/ipp.py) uses JVM transcendentals
which can differ from DuckDB/libm in the last ulp — a bit-exact SQL twin
is impossible (NOTES.md gotchas), so the DuckDB oracle for `ipp_slant`
reads this pinned 2,000-row twin instead.  The sidecar is produced by
running the REAL Spark query, so the oracle is bit-identical to the
engine by construction; tests/test_ipp.py independently verifies the
trigonometry against the vectorized numpy twin (allclose) so the sidecar
cannot drift from the thin-shell model semantics unnoticed.

Usage: python tools/gen_ipp_sidecar.py
"""

from __future__ import annotations

import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/ionex_spark/data/ipp_golden.parquet"


def main() -> None:
    from ionex_spark.plans.queries_ref import ipp_slant
    from ionex_spark.session import get_spark

    spark = get_spark("gen-ipp-sidecar")
    pdf = (
        ipp_slant(spark, "/root/testdata/sf0.001")
        .toPandas()
        .sort_values("obs_id")
        .reset_index(drop=True)
    )
    assert len(pdf) == 2000, len(pdf)
    assert pdf["slant"].between(1.0, 3.5).all()
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    pq.write_table(tbl, OUT)
    print(f"wrote {len(pdf)} rows -> {OUT}")


if __name__ == "__main__":
    main()
