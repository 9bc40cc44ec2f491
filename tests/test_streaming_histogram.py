"""Streaming histogram sketch == batch histogram sketch: the per-(group,
bin) streaming aggregation's state IS the mergeable batch sketch, so a
multi-micro-batch run must end at exactly the batch bins, and quantiles
read off the sink equal the batch quantiles."""

import pytest

pytestmark = pytest.mark.spark


def test_streaming_histogram_matches_batch(spark, tmp_path):
    from ionex_spark.operators import sketch as sk
    from ionex_spark.streaming.stream import streaming_histogram_bins

    rows = [
        (
            i,
            "g%d" % (i % 3),
            float(((i * 2654435761) % 5000)) / 10.0,
        )
        for i in range(3000)
    ]
    schema = "id bigint, g string, v double"
    src = str(tmp_path / "src")
    # three files -> three micro-batches
    for part in (rows[:1000], rows[1000:2000], rows[2000:]):
        spark.createDataFrame(part, schema).selectExpr(
            "*", "timestamp '2026-01-01 00:00:00' as ts"
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema + ", ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    bins = streaming_histogram_bins(stream, ["g"], "v", 25.0)
    q = (
        bins.writeStream.format("memory")
        .queryName("hist_bins")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select g, bin, n from hist_bins")
    batch = sk.histogram_bins(
        spark.createDataFrame(rows, schema), ["g"], "v", 25.0
    )
    got_map = {(r.g, r.bin): r.n for r in got.collect()}
    want_map = {(r.g, r.bin): r.n for r in batch.collect()}
    assert got_map == want_map

    # quantiles off the streaming sink == quantiles off the batch sketch
    sq = sk.histogram_quantiles(got, ["g"], 25.0, [0.5, 0.99]).collect()
    bq = sk.histogram_quantiles(batch, ["g"], 25.0, [0.5, 0.99]).collect()
    assert {(r.g, r.q_0_5, r.q_0_99, r.total_n) for r in sq} == {
        (r.g, r.q_0_5, r.q_0_99, r.total_n) for r in bq
    }
