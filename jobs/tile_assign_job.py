"""Production entry point: spatial-join + tile-assignment over an images
table, resumable, launched via spark-submit.

    python tools/make_pyfiles.py            # builds dist/ionex_spark.zip
    spark-submit --master local[32] \
        --py-files dist/ionex_spark.zip \
        jobs/tile_assign_job.py \
        --images synth:100000 --out /tmp/tiles_tbl --job-id run1 --chunks 8

- ``--images synth:N`` generates the deterministic image table on the fly
  (id-keyed, so chunk replays are idempotent); any other value is read as
  a parquet path with the input_hint schema + lat/lon/slot/tsec columns.
- Work is split into ``--chunks`` id-range chunks; each completed chunk
  commits one snapshot + one lineage record to the output SnapshotTable.
  Re-running with the same --job-id skips completed chunks (crash-resume).
- Prints a JSON line with per-chunk metrics on exit.

On a real cluster nothing changes but --master; the session config in
ionex_spark.session applies AQE/broadcast/Arrow settings uniformly.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession, functions as F


def build_chunk(spark, images_spec: str, lo_frac: float, hi_frac: float):
    from ionex_spark.functions import sqlgen
    from ionex_spark.operators import spatial

    if images_spec.startswith("synth:"):
        n = int(images_spec.split(":", 1)[1])
        lo, hi = int(lo_frac * n), int(hi_frac * n)
        pts = spark.range(lo, hi).selectExpr(
            "id",
            f"{sqlgen.lat_from_id_sql('id')} as lat",
            f"{sqlgen.lon_from_id_sql('id')} as lon",
            f"{sqlgen.slot_from_id_sql('id')} as slot",
        )
    else:
        imgs = spark.read.parquet(images_spec)
        pts = imgs.filter(
            f"pmod(xxhash64(image_id), 1000000) >= {int(lo_frac * 1e6)}"
            f" and pmod(xxhash64(image_id), 1000000) < {int(hi_frac * 1e6)}"
        )
    cells = spatial.build_tec_cells(spark)
    joined = spatial.spatial_join_bilinear(pts, cells)
    tiled = joined.withColumn(
        "tile_id", F.expr(sqlgen.cell_id_sql("lat", "lon", 6))
    )
    return tiled.groupBy("tile_id", "slot").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum("tec").alias("sum_tec"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", default="synth:100000")
    ap.add_argument("--out", required=True)
    ap.add_argument("--job-id", default="tile-assign")
    ap.add_argument("--chunks", type=int, default=8)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("tile-assign").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from ionex_spark.sources.tableio import ResumableJob, SnapshotTable

    table = SnapshotTable(args.out)
    job = ResumableJob(table, args.job_id)
    chunks = [
        (
            f"chunk-{i:04d}",
            (lambda lo, hi: lambda s: build_chunk(s, args.images, lo, hi))(
                i / args.chunks, (i + 1) / args.chunks
            ),
        )
        for i in range(args.chunks)
    ]
    result = job.run(spark, chunks)
    print(
        json.dumps(
            {
                "job_id": args.job_id,
                "ran": result["ran"],
                "skipped": result["skipped"],
                "chunks": len(chunks),
                "lineage_rows": len(result["lineage"]),
                "snapshot": table.current_snapshot()["snapshot_id"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
