"""Streaming checkpoint resume: a restarted query with the same
checkpointLocation processes ONLY new input and the file sink stays
exactly-once (the streaming twin of ResumableJob's snapshot resume)."""

import pytest

pytestmark = pytest.mark.spark


def _write_points(spark, src, lo, hi):
    from ionex_spark.functions import sqlgen

    spark.range(lo, hi).selectExpr(
        "id",
        f"{sqlgen.lat_from_id_sql('id')} as lat",
        f"{sqlgen.lon_from_id_sql('id')} as lon",
        f"{sqlgen.slot_from_id_sql('id')} as slot",
    ).coalesce(1).write.mode("append").parquet(src)


def _run_once(spark, src, sink, ckpt):
    from ionex_spark.operators import spatial
    from ionex_spark.streaming.stream import streaming_tile_assign

    schema = "id bigint, lat double, lon double, slot bigint"
    stream = spark.readStream.schema(schema).parquet(src)
    tiled = streaming_tile_assign(stream, spatial.build_tec_cells(spark))
    q = (
        tiled.select("id", "tile_id", "tec")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_checkpoint_resume_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    _write_points(spark, src, 0, 500)
    _run_once(spark, src, sink, ckpt)
    first = spark.read.parquet(sink)
    assert first.count() == 500

    # new data arrives; a NEW query resumes from the same checkpoint
    _write_points(spark, src, 500, 1200)
    _run_once(spark, src, sink, ckpt)
    final = spark.read.parquet(sink)
    assert final.count() == 1200                      # no duplicates
    assert final.select("id").distinct().count() == 1200

    # re-running with no new input is a no-op (idempotent replay)
    _run_once(spark, src, sink, ckpt)
    assert spark.read.parquet(sink).count() == 1200
