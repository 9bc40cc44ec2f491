"""Stream-stream interval join (attribution) == the batch interval join
on the same data, with bounded state via dual watermarks."""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    from ionex_spark.streaming.stream import streaming_interval_join

    vdir, cdir = str(tmp_path / "views"), str(tmp_path / "clicks")
    vschema = "v_user_id bigint, view_id bigint, view_ts timestamp"
    cschema = "c_user_id bigint, click_id bigint, click_ts timestamp"

    def ts(m):
        return f"timestamp '2026-01-01 00:00:00' + interval {m} minutes"

    views = [(1, 10, 0), (1, 11, 90), (2, 20, 5), (3, 30, 0)]
    clicks = [
        (1, 100, 30),   # matches view 10 (30 min lag)
        (1, 101, 95),   # matches view 11 (5 min) — NOT view 10 (95 > 60)
        (2, 200, 70),   # no match: 65 min after view 20
        (4, 400, 10),   # no matching user
    ]
    spark.createDataFrame(
        [(u, i, None) for u, i, _ in views], vschema
    ).limit(0).write.mode("overwrite").parquet(vdir)  # schema seed
    for u, i, m in views:
        spark.sql(
            f"select cast({u} as bigint) v_user_id,"
            f" cast({i} as bigint) view_id, {ts(m)} view_ts"
        ).coalesce(1).write.mode("append").parquet(vdir)
    spark.createDataFrame([], cschema).write.mode("overwrite").parquet(cdir)
    for u, i, m in clicks:
        spark.sql(
            f"select cast({u} as bigint) c_user_id,"
            f" cast({i} as bigint) click_id, {ts(m)} click_ts"
        ).coalesce(1).write.mode("append").parquet(cdir)

    vs = spark.readStream.schema(vschema).parquet(vdir)
    cs = spark.readStream.schema(cschema).parquet(cdir)
    q = (
        streaming_interval_join(vs, cs)
        .writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(
        "select view_id, click_id from attrib"
    ).toPandas()
    pairs = set(zip(got["view_id"], got["click_id"]))
    assert pairs == {(10, 100), (11, 101)}

    # batch twin on identical data agrees
    bv = spark.read.schema(vschema).parquet(vdir)
    bc = spark.read.schema(cschema).parquet(cdir)
    batch = bv.join(
        bc,
        (bv.v_user_id == bc.c_user_id)
        & (bv.view_ts <= bc.click_ts)
        & (bc.click_ts <= bv.view_ts + F.expr("interval 1 hour")),
    )
    bpairs = set(
        (r.view_id, r.click_id)
        for r in batch.select("view_id", "click_id").collect()
    )
    assert bpairs == pairs
