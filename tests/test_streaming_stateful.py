"""applyInPandasWithState custom stateful operator — state carries across
micro-batches (maxFilesPerTrigger=1 forces two batches)."""

import pytest

pytestmark = pytest.mark.spark


def test_stateful_tile_stats_accumulates(spark, tmp_path):
    from ionex_spark.functions import sqlgen
    from ionex_spark.operators import spatial
    from ionex_spark.streaming.stream import (
        streaming_tile_assign,
        streaming_tile_stats,
    )

    src = str(tmp_path / "src")
    # two separate files -> two micro-batches with maxFilesPerTrigger=1;
    # batch 2 reuses batch 1's spatial ids (id % 800) so the same tiles
    # appear in both batches and state carry-over is observable
    for lo, hi in ((0, 800), (800, 1600)):
        spark.range(lo, hi).selectExpr(
            "id",
            f"{sqlgen.lat_from_id_sql('(id % 800)')} as lat",
            f"{sqlgen.lon_from_id_sql('(id % 800)')} as lon",
            f"{sqlgen.slot_from_id_sql('(id % 800)')} as slot",
        ).coalesce(1).write.mode("append").parquet(src)

    cells = spatial.build_tec_cells(spark)
    schema = "id bigint, lat double, lon double, slot bigint"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    tiled = streaming_tile_assign(stream, cells)
    stats = streaming_tile_stats(tiled)
    q = (
        stats.writeStream.format("memory")
        .queryName("tile_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from tile_stats").toPandas()

    # update-mode memory sink appends one row per (batch, tile); the last
    # row per tile carries the cumulative totals
    last = got.groupby("tile_id").last()
    want = (
        streaming_tile_assign(
            spark.read.schema(schema).parquet(src), cells
        )
        .groupBy("tile_id")
        .count()
        .toPandas()
        .set_index("tile_id")["count"]
    )
    assert len(last) == len(want)
    # cumulative count per tile equals the batch answer
    assert (last["n_total"].sort_index() == want.sort_index()).all()
    # at least one tile saw rows in both micro-batches (state carried)
    multi = got.groupby("tile_id").size()
    carried = got[got["tile_id"].isin(multi[multi > 1].index)]
    assert (carried.groupby("tile_id")["n_total"].max()
            > carried.groupby("tile_id")["batch_rows"].max()).any()
