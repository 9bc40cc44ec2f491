"""SnapshotTable semantics, resumable jobs, and the streaming pipeline."""

import json
import os

import pytest

from ionex_spark.sources.tableio import ResumableJob, SnapshotTable

pytestmark = pytest.mark.spark


def test_snapshot_append_and_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    s1 = t.append(spark.range(10).selectExpr("id", "id * 2 as v"))
    s2 = t.append(spark.range(10, 15).selectExpr("id", "id * 2 as v"))
    assert (s1, s2) == (1, 2)
    assert t.read(spark).count() == 15
    assert t.read(spark, snapshot_id=1).count() == 10  # time travel
    snaps = t.snapshots()
    assert snaps[1]["parent_id"] == 1
    assert len(snaps[1]["added_files"]) >= 1
    with pytest.raises(KeyError):
        t.read(spark, snapshot_id=99)


def test_resumable_job_skips_completed_chunks(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    job = ResumableJob(t, "job-1")

    calls = []

    def chunk(lo, hi):
        def fn(s):
            calls.append((lo, hi))
            return s.range(lo, hi).selectExpr("id", "id + 100 as v")

        return fn

    chunks = [(f"c{i}", chunk(i * 10, (i + 1) * 10)) for i in range(3)]
    r1 = job.run(spark, chunks)
    assert r1["ran"] == ["c0", "c1", "c2"] and not r1["skipped"]
    assert t.read(spark).count() == 30

    # resume: nothing re-runs, no new data
    calls.clear()
    r2 = job.run(spark, chunks)
    assert r2["skipped"] == ["c0", "c1", "c2"] and not r2["ran"]
    assert not calls
    assert t.read(spark).count() == 30

    # crash-window simulation: c1's snapshot committed but its lineage
    # record was lost.  Resume must NOT re-execute or re-append the chunk
    # (that would duplicate its rows) — it backfills lineage from the
    # snapshot summary.
    recs = job.lineage()
    with open(job.lineage_path, "w") as fh:
        json.dump([r for r in recs if r["chunk"] != "c1"], fh)
    calls.clear()
    r3 = job.run(spark, chunks)
    assert r3["recovered"] == ["c1"] and not r3["ran"]
    assert r3["skipped"] == ["c0", "c2"]
    assert not calls  # producer never invoked
    assert t.read(spark).count() == 30  # no duplicated rows
    assert "c1" in job.completed_chunks()

    m = job.metrics_df(spark).toPandas()
    assert set(m["chunk"]) == {"c0", "c1", "c2"}
    assert (m["rows"] == 10).all()
    # recovered record carries seconds == 0.0; original timings survive
    assert (m[m["chunk"] != "c1"]["seconds"] > 0).all()


def test_streaming_tile_pipeline(spark, tmp_path):
    """File-source micro-batch stream -> stream-static broadcast join ->
    windowed tile rollup == the batch answer on the same rows."""
    import numpy as np

    from ionex_spark.functions import sqlgen
    from ionex_spark.operators import spatial
    from ionex_spark.streaming.stream import (
        stream_points_from_files,
        streaming_tile_assign,
        windowed_tile_counts,
    )

    src = str(tmp_path / "src")
    n = 2000
    batch_pts = spark.range(n).selectExpr(
        "id",
        f"{sqlgen.lat_from_id_sql('id')} as lat",
        f"{sqlgen.lon_from_id_sql('id')} as lon",
        f"{sqlgen.slot_from_id_sql('id')} as slot",
        f"timestamp '2022-01-02 00:00:00' + make_interval(0, 0, 0, 0, 0, 0,"
        f" {sqlgen.slot_from_id_sql('id')} * 3600) as ts",
    )
    batch_pts.repartition(4).write.parquet(src)

    cells = spatial.build_tec_cells(spark)
    schema = "id bigint, lat double, lon double, slot bigint, ts timestamp"
    stream = stream_points_from_files(spark, src, schema)
    assert stream.isStreaming
    tiled = streaming_tile_assign(stream, cells)
    agg = windowed_tile_counts(tiled, window="1 hour", watermark="2 hours")

    q = (
        agg.writeStream.format("memory")
        .queryName("tiles_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query did not finish in 120s"
    got = spark.sql(
        "select tile_id, sum(n_points) as n from tiles_stream group by tile_id"
    ).toPandas()

    want = (
        streaming_tile_assign(batch_pts, cells)
        .groupBy("tile_id")
        .count()
        .toPandas()
    )
    gw = got.sort_values("tile_id").reset_index(drop=True)
    ww = want.sort_values("tile_id").reset_index(drop=True)
    assert len(gw) == len(ww)
    np.testing.assert_array_equal(gw["tile_id"], ww["tile_id"])
    np.testing.assert_array_equal(gw["n"], ww["count"])


def test_streaming_dedup_exact(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps one row per key across
    micro-batches (bounded state: keys expire past the watermark)."""
    from ionex_spark.streaming.stream import (
        stream_points_from_files,
        streaming_dedup_exact,
    )

    src = str(tmp_path / "dsrc")
    # 300 rows over 100 distinct keys, same event-time hour
    batch = spark.range(300).selectExpr(
        "id % 100 as key",
        "concat('payload-', id % 100) as payload",
        "timestamp '2022-01-02 00:00:00' + make_interval(0, 0, 0, 0, 0, 0,"
        " id % 60) as ts",
    )
    batch.repartition(3).write.parquet(src)

    schema = "key bigint, payload string, ts timestamp"
    stream = stream_points_from_files(spark, src, schema)
    deduped = streaming_dedup_exact(stream, ["key"], ts_col="ts")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query did not finish in 120s"
    got = spark.sql("select key, count(*) as n from dedup_stream group by key")
    pdf = got.toPandas()
    assert len(pdf) == 100
    assert (pdf["n"] == 1).all()


def test_iceberg_detection_and_factory_dispatch(spark, tmp_path):
    """The factory returns the parquet+manifest fallback whenever the
    Iceberg runtime is absent (this sandbox) — and never by accident:
    detection is a real classpath probe, not a config flag."""
    from ionex_spark.sources import tableio as tio

    t = tio.make_table(spark, str(tmp_path / "t"))
    assert isinstance(t, tio.SnapshotTable)
    if tio.iceberg_available(spark):
        pytest.skip("Iceberg runtime present: IcebergTable dispatch active")
    # jar-free: even a catalog name falls back to the manifest table
    t2 = tio.make_table(spark, str(tmp_path / "t2"), name="cat.db.tbl")
    assert isinstance(t2, tio.SnapshotTable)


def test_resumable_job_explicit_lineage_dir(spark, tmp_path):
    """ResumableJob accepts a lineage_dir decoupled from the table root
    (required for catalog-named Iceberg tables)."""
    from ionex_spark.sources.tableio import ResumableJob, SnapshotTable

    table = SnapshotTable(str(tmp_path / "tbl"))
    ldir = str(tmp_path / "lineage_elsewhere")
    job = ResumableJob(table, "job-x", lineage_dir=ldir)
    res = job.run(
        spark, [("c1", lambda s: s.range(5).selectExpr("id as v"))]
    )
    assert res["ran"] == ["c1"]
    assert os.path.exists(os.path.join(ldir, "job-x.json"))
    assert job.lineage()[0]["rows"] == 5


def test_upsert_copy_on_write_and_cdc(spark, tmp_path):
    """MERGE-INTO semantics + time travel + snapshot diff round trip."""
    from ionex_spark.operators.cdc import snapshot_diff
    from ionex_spark.sources.tableio import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k bigint, name string, v double",
    )
    s1 = t.upsert(spark, v1, keys=["k"])
    # update k=2, insert k=4, leave 1 and 3 untouched
    up = spark.createDataFrame(
        [(2, "b", 25.0), (4, "d", 40.0)], "k bigint, name string, v double"
    )
    s2 = t.upsert(spark, up, keys=["k"])
    now = t.read(spark).toPandas().set_index("k").sort_index()
    assert list(now.index) == [1, 2, 3, 4]
    assert now.loc[2, "v"] == 25.0 and now.loc[4, "v"] == 40.0
    # time travel: v1 unchanged
    then = t.read(spark, s1).toPandas().set_index("k").sort_index()
    assert list(then.index) == [1, 2, 3] and then.loc[2, "v"] == 20.0
    # CDC across the two snapshots
    d = (
        snapshot_diff(
            t.read(spark, s1), t.read(spark, s2),
            keys=["k"], compare_cols=["v"],
        )
        .toPandas()
        .set_index("k")
        .sort_index()
    )
    assert list(d.index) == [2, 4]
    assert d.loc[2, "change_type"] == "changed"
    assert d.loc[4, "change_type"] == "added"
    assert d.loc[2, "v_old"] == 20.0 and d.loc[2, "v_new"] == 25.0


def test_upsert_null_update_wins(spark, tmp_path):
    """An update row carrying NULL must overwrite the old value (matched
    keys take the update image verbatim, not coalesce-by-value)."""
    from ionex_spark.sources.tableio import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl2"))
    t.upsert(
        spark,
        spark.createDataFrame([(1, 5.0)], "k bigint, v double"),
        keys=["k"],
    )
    t.upsert(
        spark,
        spark.createDataFrame([(1, None)], "k bigint, v double"),
        keys=["k"],
    )
    got = t.read(spark).first()
    assert got.k == 1 and got.v is None


def test_watermark_drops_late_rows(spark, tmp_path):
    """The windowed rollup must DROP events arriving later than the
    watermark horizon and keep on-time rows — pinning the late-data
    semantics the 100 TB streaming design claims (bounded state via
    eviction, not unbounded buffering).  Two checkpointed runs make the
    ordering deterministic: run 1 advances the watermark to 11:50 and
    persists it; run 2 delivers one LATE row (10:05) and one on-time
    row."""
    from ionex_spark.streaming.stream import windowed_tile_counts

    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ckpt")
    schema = "tile_id bigint, tec double, ts timestamp"

    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    out_rows = []

    def sink(df, _bid):
        out_rows.extend(df.collect())

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            windowed_tile_counts(
                stream, window="1 hour", watermark="10 minutes"
            )
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # run 1: on-time events up to 12:00 -> committed watermark ~ 11:50
    write([(1, 1.0, at(0)), (1, 1.0, at(30)), (1, 1.0, at(120))])
    run_once()
    # run 2: one LATE event far behind the persisted watermark plus an
    # on-time event that closes the 12:00 window
    write([(1, 99.0, at(5)), (1, 1.0, at(130))])
    run_once()

    agg = {}
    for r in out_rows:
        agg[r.window_start] = (r.n_points, r.sum_tec)
    # the 10:00 window finalized with ONLY the on-time rows: the late
    # 99.0 event was dropped by the restored watermark, not merged
    assert agg[at(0)] == (2, 2.0)
    # and the 12:00 window carries the run-1 event (+ run-2 on-time row
    # if its window closed); it must never contain the late event
    for (n, s) in agg.values():
        assert s != 99.0 and s < 99.0


def test_incremental_rollup_maintenance(spark):
    """rollup(new_base) == apply_rollup_delta(rollup(old_base),
    diff(old, new)) — incremental view maintenance without rescanning
    the base, including key birth and key death."""
    from pyspark.sql import functions as F

    from ionex_spark.operators.cdc import apply_rollup_delta, snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 5.0), (3, "b", 7.0), (4, "c", 1.0)],
        "k bigint, g string, v double",
    )
    # churn: update k=2 (a: 5->8), remove k=4 (kills group c), add
    # k=5 (new group d) and k=6 (grows group b)
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 8.0), (3, "b", 7.0),
         (5, "d", 2.0), (6, "b", 4.0)],
        "k bigint, g string, v double",
    )

    def rollup(df):
        return df.groupBy("g").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("v")
        )

    # the diff is keyed by row id; carry the group through both images
    d = snapshot_diff(old, new, keys=["k"], compare_cols=["g", "v"])
    d = d.selectExpr(
        "coalesce(g_new, g_old) as g", "change_type", "v_old", "v_new",
        # a group change would need split contributions; none here
    )
    got = (
        apply_rollup_delta(rollup(old), d, keys=["g"], sum_cols=["v"])
        .toPandas().set_index("g").sort_index()
    )
    want = rollup(new).toPandas().set_index("g").sort_index()
    assert got.equals(want), (got, want)


# ------------------------------------------------ schema evolution

def test_schema_evolution_rename_add_and_time_travel(spark, tmp_path):
    from ionex_spark.sources.tableio import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    s1 = t.append(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "id bigint, value double")
    )
    # rename value -> val, add w double
    t.evolve_schema(add_columns={"w": "double"}, renames={"value": "val"})
    s3 = t.append(
        spark.createDataFrame(
            [(3, 30.0, 0.5)], "id bigint, val double, w double"
        )
    )
    cur = t.read(spark).orderBy("id").toPandas()
    assert list(cur.columns) == ["id", "val", "w"]
    assert list(cur["val"]) == [10.0, 20.0, 30.0]
    # pre-evolution rows read the renamed column through its id; the
    # added column is NULL for them
    assert cur["w"].isna().tolist() == [True, True, False]
    # time travel: snapshot 1 still reads under ITS schema
    old = t.read(spark, s1).orderBy("id").toPandas()
    assert list(old.columns) == ["id", "value"]
    assert list(old["value"]) == [10.0, 20.0]
    # appending with the OLD column name now fails loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="evolve_schema"):
        t.append(
            spark.createDataFrame([(9, 1.0)], "id bigint, value double")
        )
    assert s3 == 3


def test_schema_evolution_guards(spark, tmp_path):
    from ionex_spark.sources.tableio import SnapshotTable
    import pytest as _pytest

    t = SnapshotTable(str(tmp_path / "tbl"))
    with _pytest.raises(ValueError, match="initialized"):
        t.evolve_schema(add_columns={"x": "double"})
    t.append(spark.createDataFrame([(1,)], "id bigint"))
    with _pytest.raises(ValueError, match="unknown column"):
        t.evolve_schema(renames={"nope": "x"})
    with _pytest.raises(ValueError, match="already exists"):
        t.evolve_schema(add_columns={"id": "double"})
    # ADVICE r5: same NAME but different TYPE must fail at commit time,
    # not surface later as conflicting parquet physical types
    with _pytest.raises(ValueError, match="types do not match"):
        t.append(spark.createDataFrame([(1.5,)], "id double"))


# ------------------------------------------------ small-file compaction

def test_rewrite_data_files_compacts_and_preserves_data(spark, tmp_path):
    from ionex_spark.sources.tableio import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    # 3 appends x 8 partitions = 24 small files
    for lo in (0, 100, 200):
        t.append(
            spark.range(lo, lo + 100).repartition(8).selectExpr(
                "id", "id % 7 as k", "cast(id as double) as v"
            )
        )
    pre = t.current_snapshot()
    assert len(pre["files"]) >= 20
    before = t.read(spark).orderBy("id").toPandas()

    sid = t.rewrite_data_files(spark, target_files=2)
    post = t.current_snapshot()
    assert post["snapshot_id"] == sid
    assert len(post["files"]) == 2
    after = t.read(spark).orderBy("id").toPandas()
    import pandas as pd

    pd.testing.assert_frame_equal(before, after)
    # pre-compaction snapshot still time-travels to the small-file layout
    assert len(t._files_at(pre["snapshot_id"])) == len(pre["files"])
    assert t.read(spark, pre["snapshot_id"]).count() == 300


def test_rewrite_data_files_sorted_layout_prunes(spark, tmp_path):
    """sort_by produces non-overlapping per-file ranges: each output
    file's footer min/max on the sort key covers a disjoint slice, the
    precondition for parquet row-group pruning."""
    from ionex_spark.sources.tableio import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(spark.range(1000).selectExpr("id", "(id * 37) % 1000 as zkey"))
    t.rewrite_data_files(spark, target_files=4, sort_by=["zkey"])
    from pyspark.sql import functions as Fn

    files = t.current_snapshot()["files"]
    assert len(files) == 4
    ranges = []
    for f in files:
        pdf = spark.read.parquet(f).agg(
            Fn.min("zkey"), Fn.max("zkey")
        ).collect()[0]
        ranges.append((pdf[0], pdf[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, ranges  # disjoint => footer stats prune


def test_legacy_table_append_validates_columns(spark, tmp_path):
    """Appending mismatched columns to a pre-schema-tracking table must
    raise instead of retro-tagging legacy files with a wrong schema
    (review finding)."""
    import json as _json
    import os as _os

    from ionex_spark.sources.tableio import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(spark.createDataFrame([(1, 10.0)], "event_id bigint, value double"))
    # strip the schema keys to simulate a legacy manifest
    mpath = _os.path.join(t.meta_dir, sorted(_os.listdir(t.meta_dir))[0])
    man = _json.load(open(mpath))
    for k in ("schema", "schema_id", "schemas", "file_schemas"):
        man.pop(k, None)
    _json.dump(man, open(mpath, "w"))

    import pytest as _pytest

    with _pytest.raises(ValueError, match="legacy"):
        t.append(
            spark.createDataFrame([(2, 1.0)], "event_id bigint, val2 double")
        )
    # matching columns still append fine and re-derive the schema
    sid = t.append(
        spark.createDataFrame([(2, 20.0)], "event_id bigint, value double")
    )
    assert sid == 2
    assert t.read(spark).count() == 2


def test_rewrite_failure_leaves_table_unchanged(spark, tmp_path, monkeypatch):
    """A rewrite whose staged output loses rows must abort BEFORE any
    snapshot commit (review finding: the old post-commit guard left the
    corrupt snapshot current)."""
    from ionex_spark.sources import tableio as tio

    t = tio.SnapshotTable(str(tmp_path / "tbl"))
    t.append(spark.range(100).selectExpr("id", "id * 2 as v"))
    pre = t.current_snapshot()

    real_stage = tio.SnapshotTable._write_stage

    def corrupt_stage(self, df):
        return real_stage(self, df.filter("id < 50"))  # drop half

    monkeypatch.setattr(tio.SnapshotTable, "_write_stage", corrupt_stage)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="changed row count"):
        t.rewrite_data_files(spark, target_files=1)
    post = t.current_snapshot()
    assert post["snapshot_id"] == pre["snapshot_id"]  # no commit happened
    assert t.read(spark).count() == 100


def test_schema_evolution_random_sequence(spark, tmp_path):
    """Randomized append/evolve/compact sequence against a plain pandas
    model: after any interleaving, read() must equal the model under
    the CURRENT schema and time travel must reproduce each historical
    state (seeded, 12 steps)."""
    import random

    import pandas as pd

    from ionex_spark.sources.tableio import SnapshotTable

    rng = random.Random(77)
    t = SnapshotTable(str(tmp_path / "tbl"))
    cols = ["id", "c0"]  # current logical schema (ordered)
    next_col = 1
    model = pd.DataFrame(columns=cols)  # expected CURRENT-schema rows
    history = {}  # snapshot_id -> (cols, model copy)
    next_id = 0

    def _append():
        nonlocal model, next_id
        n = rng.randint(1, 5)
        rows = [
            tuple([next_id + i] + [float((next_id + i) * 10 + j)
                                   for j in range(1, len(cols))])
            for i in range(n)
        ]
        next_id += n
        schema = ", ".join(
            [f"{cols[0]} bigint"] + [f"{c} double" for c in cols[1:]]
        )
        sid = t.append(spark.createDataFrame(rows, schema))
        model = pd.concat(
            [model, pd.DataFrame(rows, columns=cols)], ignore_index=True
        )
        history[sid] = (list(cols), model.copy())

    def _evolve():
        nonlocal next_col
        op = rng.choice(["rename", "add"])
        if op == "rename" and len(cols) > 1:
            i = rng.randrange(1, len(cols))
            new = f"c{next_col}r"
            next_col += 1  # consume the counter: two renames in a row
            # must not generate the same target name
            model.rename(columns={cols[i]: new}, inplace=True)
            t.evolve_schema(renames={cols[i]: new})
            cols[i] = new
        else:
            new = f"c{next_col}"
            next_col += 1
            t.evolve_schema(add_columns={new: "double"})
            cols.append(new)
            model[new] = float("nan")
        sid = t.current_snapshot()["snapshot_id"]
        history[sid] = (list(cols), model.copy())

    def _compact():
        sid = t.rewrite_data_files(spark, target_files=2)
        history[sid] = (list(cols), model.copy())

    _append()
    for _ in range(11):
        rng.choice([_append, _append, _evolve, _compact])()

    def check(df, want_cols, want_model):
        got = df.toPandas().sort_values("id").reset_index(drop=True)
        assert list(got.columns) == want_cols
        want = want_model.sort_values("id").reset_index(drop=True)
        for c in want_cols:
            gv = got[c].astype(float) if c != "id" else got[c]
            wv = want[c].astype(float) if c != "id" else want[c]
            pd.testing.assert_series_equal(
                gv, wv, check_names=False, check_dtype=False
            )

    check(t.read(spark), cols, model)
    for sid, (hcols, hmodel) in history.items():
        check(t.read(spark, sid), hcols, hmodel)


def test_backend_surface_parity():
    """Every public SnapshotTable operation must exist on IcebergTable
    (mapped to native DDL/procedures), so make_table call sites stay
    backend-agnostic as the surface grows."""
    from ionex_spark.sources.tableio import IcebergTable, SnapshotTable

    snap = {m for m in dir(SnapshotTable) if not m.startswith("_")}
    ice = {m for m in dir(IcebergTable) if not m.startswith("_")}
    assert snap <= ice, snap - ice
