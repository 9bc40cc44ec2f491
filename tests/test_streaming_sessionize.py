"""Streaming sessionization (applyInPandasWithState) == batch
sessionize semantics, with sessions spanning micro-batch boundaries."""

import pandas as pd
import pytest

pytestmark = pytest.mark.spark

GAP = 1800


def _batch_sessions(rows):
    """Reference: pandas reimplementation of the gated batch query
    sessionize_events (30-min gap)."""
    out = []
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "tsec"])
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["tsec", "event_id"])
        sid, start, last, n = 0, None, None, 0
        for t in g["tsec"]:
            if last is not None and t - last > GAP:
                out.append((uid, sid, n, start, last))
                sid += 1
                start, n = None, 0
            if start is None:
                start = t
            n += 1
            last = t
        out.append((uid, sid, n, start, last))
    return sorted(out)


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    from ionex_spark.streaming.stream import streaming_sessionize

    rows = []
    eid = 0
    # user 1: session crossing the batch boundary (events at 0..3000s in
    # file 1, continues at 3500s in file 2), then a gap -> second session
    for t in (0, 1000, 3000):
        rows.append((1, (eid := eid + 1), t))
    batch2 = [(1, (eid := eid + 1), 3500), (1, (eid := eid + 1), 9000)]
    # user 2: two sessions entirely inside file 1
    for t in (100, 200, 5000):
        rows.append((2, (eid := eid + 1), t))
    # user 3: appears only in file 2
    batch2 += [(3, (eid := eid + 1), 42)]

    src = str(tmp_path / "src")
    schema = "user_id bigint, event_id bigint, tsec bigint"
    for part in (rows, batch2):
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_sessionize(stream)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from sessions").toPandas()

    # final state per (user, session): last emitted row (update mode)
    final = got.sort_index().groupby(["user_id", "session_id"]).last()
    got_sessions = sorted(
        (int(u), int(s), int(r["n_events"]), int(r["session_start"]),
         int(r["session_end"]))
        for (u, s), r in final.iterrows()
    )
    assert got_sessions == _batch_sessions(rows + batch2)
    # closed flags: every session except each user's last is closed=1
    for (u, s), r in final.iterrows():
        is_last = s == final.loc[u].index.max()
        assert r["closed"] == (0 if is_last else 1), (u, s)


def test_streaming_sessionize_checkpoint_restart(spark, tmp_path):
    """The session state machine must survive a full query RESTART from
    the checkpoint: batch 2 runs in a brand-new streaming query and
    still stitches onto batch 1's open session."""
    from ionex_spark.streaming.stream import streaming_sessionize

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id bigint, event_id bigint, tsec bigint"

    out_rows = []

    def sink(df, _bid):
        out_rows.extend(df.collect())

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            streaming_sessionize(stream)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # run 1: an open session for user 7
    spark.createDataFrame(
        [(7, 1, 100), (7, 2, 900)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    # run 2 (new query, same checkpoint): continuation + later a gap
    spark.createDataFrame(
        [(7, 3, 1500), (7, 4, 9000)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()

    final = {}
    for r in out_rows:
        final[(r.user_id, r.session_id)] = r
    s0 = final[(7, 0)]
    # session 0 spans BOTH runs: events 100, 900 (run 1) + 1500 (run 2)
    assert (s0.n_events, s0.session_start, s0.session_end, s0.closed) == (
        3, 100, 1500, 1,
    )
    s1 = final[(7, 1)]
    assert (s1.n_events, s1.session_start, s1.closed) == (1, 9000, 0)
