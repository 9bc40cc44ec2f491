"""Stream-static near-dup alerts: incoming signatures within hamming<=3
of a static reference corpus alert exactly once, matching the batch
operator's pair set."""

import pytest

pytestmark = pytest.mark.spark


def _sig_rows(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_streaming_near_dup_alerts_matches_batch(spark, tmp_path):
    import random

    from ionex_spark.operators import dedup as dd
    from ionex_spark.streaming.stream import streaming_near_dup_alerts

    rng = random.Random(3)

    def bands(fp):
        return [(fp >> (16 * b)) & 0xFFFF for b in range(4)]

    # static corpus: 300 random signatures
    corpus_fps = {i: rng.getrandbits(64) for i in range(300)}
    corpus = _sig_rows(
        spark,
        [(i, *bands(fp)) for i, fp in corpus_fps.items()],
        "doc_id bigint, band_0 bigint, band_1 bigint,"
        " band_2 bigint, band_3 bigint",
    )
    # stream: 100 fresh signatures + 40 near-dups of corpus entries
    # (<=3 flipped bits), split over two files -> two micro-batches
    stream_rows, want_pairs = [], set()
    for j in range(100):
        stream_rows.append((1000 + j, *bands(rng.getrandbits(64))))
    for j in range(40):
        base = rng.randrange(300)
        fp = corpus_fps[base]
        for b in rng.sample(range(64), rng.randint(1, 3)):
            fp ^= 1 << b
        stream_rows.append((2000 + j, *bands(fp)))
        want_pairs.add((2000 + j, base))
    src = str(tmp_path / "src")
    schema = (
        "doc_id bigint, band_0 bigint, band_1 bigint,"
        " band_2 bigint, band_3 bigint"
    )
    half = len(stream_rows) // 2
    for part in (stream_rows[:half], stream_rows[half:]):
        _sig_rows(spark, part, schema).selectExpr(
            "*", "timestamp '2026-01-01 00:00:00' as ts"
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema + ", ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    alerts = streaming_near_dup_alerts(stream, corpus)
    q = (
        alerts.writeStream.format("memory")
        .queryName("neardup_alerts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(
        "select stream_id, corpus_id, hamming from neardup_alerts"
    ).toPandas()
    got_pairs = set(zip(got["stream_id"], got["corpus_id"]))
    # every planted near-dup alerts (completeness); chance extras from the
    # 100 random signatures are possible but astronomically unlikely
    assert want_pairs <= got_pairs
    # each pair alerts exactly once despite multi-band matches
    assert not got.duplicated(["stream_id", "corpus_id"]).any()
    # and all alerts verify at hamming<=3 (exactness of the verify stage)
    assert (got["hamming"] <= 3).all()
