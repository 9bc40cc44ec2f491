"""Streaming incremental dedup == batch incremental dedup: the stream
probes the same corpus bloom filter and runs the same exact verify, so
the union of micro-batch outputs must equal the batch operator row for
row — including bloom false positives (same deterministic md5 bitmap).
"""

import pytest

pytestmark = pytest.mark.spark

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _increment(spark):
    docs = spark.read.parquet(DOCS)
    return docs.filter("doc_id % 5 = 0").selectExpr(
        "doc_id + 100000 as doc_id", "text"
    ).unionByName(
        docs.filter("doc_id % 7 = 1").selectExpr(
            "doc_id + 200000 as doc_id", "concat(text, ' zzz') as text"
        )
    )


def test_streaming_incremental_dedup_matches_batch(spark, tmp_path):
    from ionex_spark.operators import dedup as dd
    from ionex_spark.streaming.stream import streaming_incremental_dedup

    corpus = spark.read.parquet(DOCS)
    inc = _increment(spark)

    batch = {
        r.doc_id: (r.bloom_candidate, r.is_dup)
        for r in dd.incremental_dedup(inc, corpus).collect()
    }

    # three micro-batches via maxFilesPerTrigger
    src = str(tmp_path / "inc_src")
    parts = inc.randomSplit([1.0, 1.0, 1.0], seed=7)
    for p in parts:
        p.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_incremental_dedup(stream, corpus)
    q = (
        out.writeStream.format("memory")
        .queryName("inc_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.doc_id: (r.bloom_candidate, r.is_dup)
        for r in spark.sql("select * from inc_dedup").collect()
    }
    assert got == batch
    assert any(d == 1 for _, d in got.values())  # planted dups present
    assert any(d == 0 for _, d in got.values())  # planted new docs too


def test_streaming_incremental_dedup_checkpoint_restart(spark, tmp_path):
    """Restart with the same checkpoint: the second query run processes
    ONLY files added after the stop, and the parquet sink stays
    exactly-once (no reprocessed rows, no gaps) — the operator is
    stateless, so all resume correctness rides on source offsets."""
    from ionex_spark.streaming.stream import streaming_incremental_dedup

    corpus = spark.read.parquet(DOCS)
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ck")
    inc = _increment(spark)
    half1 = inc.filter("doc_id % 2 = 0")
    half2 = inc.filter("doc_id % 2 = 1")
    half1.coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .parquet(src)
        )
        out = streaming_incremental_dedup(stream, corpus)
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    n1 = spark.read.parquet(sink).count()
    assert n1 == half1.count()

    half2.coalesce(1).write.mode("append").parquet(src)
    run_once()  # restart from the same checkpoint

    got = spark.read.parquet(sink)
    assert got.count() == inc.count()  # exactly-once: no dup, no gap
    assert got.select("doc_id").distinct().count() == inc.count()

    # values identical to the batch operator after the restart
    from ionex_spark.operators import dedup as dd

    batch = {
        r.doc_id: (r.bloom_candidate, r.is_dup)
        for r in dd.incremental_dedup(inc, corpus).collect()
    }
    streamed = {
        r.doc_id: (r.bloom_candidate, r.is_dup) for r in got.collect()
    }
    assert streamed == batch
