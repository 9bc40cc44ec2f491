"""Salted rollup correctness + the planted-hot-cell fixture."""

import pytest
from pyspark.sql import functions as F

from ionex_spark.operators import skew
from ionex_spark.operators.spatial import with_cell_index

pytestmark = pytest.mark.spark


def test_salted_rollup_equals_plain(spark):
    df = spark.range(20000).selectExpr(
        "id",
        "id % 7 as k",          # 7 groups
        "cast(id % 100 as double) as v",
    )
    plain = (
        df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("count_v"),
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    salted = (
        skew.salted_rollup(df, ["k"], {"v": "sum", "id": "count"}, n_salts=8)
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert (salted["sum_v"] == plain["sum_v"]).all()
    assert (salted["count_id"] == plain["count_v"]).all()


def test_salt_is_deterministic_and_bounded(spark):
    df = skew.with_salt(spark.range(1000), 16)
    got = df.toPandas()
    assert got["salt"].between(0, 15).all()
    again = skew.with_salt(spark.range(1000), 16).toPandas()
    assert (got["salt"] == again["salt"]).all()


def test_hot_cells_detected_and_salted(spark):
    """The synthetic images generator plants ~20% of rows in 3 hot cells;
    skew_stats must surface them, and the salted partial stage must cap
    the max per-task group size."""
    from ionex_spark.sources.images import images_df

    imgs = images_df(spark, 4000, partitions=4).select(
        "image_id", "lat", "lon", "phash"
    )
    pts = with_cell_index(imgs)
    stats = skew.skew_stats(pts, ["lat_i", "lon_i"], top=5).toPandas()
    # planted hot spots (jitter splits some across a cell edge): top cell
    # ~6%, next four ~3% each vs uniform background ~0.02%
    assert stats["share"].iloc[0] > 0.04
    assert (stats["share"].iloc[:5] > 0.02).all()

    salted = skew.with_salt(pts, 16, entropy_col="phash")
    per_task_groups = (
        salted.groupBy("lat_i", "lon_i", "salt")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
    )
    hot = stats.iloc[0]
    hot_groups = per_task_groups[
        (per_task_groups["lat_i"] == hot["lat_i"])
        & (per_task_groups["lon_i"] == hot["lon_i"])
    ]
    assert len(hot_groups) == 16  # hot cell spread over all 16 salts
    assert hot_groups["n"].max() < hot["n_rows"]  # no single task gets it all


def test_salted_join_equals_plain_join_and_avoids_broadcast(spark):
    from ionex_spark.operators import skew

    facts = spark.range(20000).selectExpr(
        "id",
        "case when id % 10 < 9 then cast(0 as bigint) else id % 20 end as k",
        "id % 97 as fv",
    )
    dim = spark.range(20).selectExpr("id as k", "id * 11 as dv")
    j = skew.salted_join(facts, dim, ["k"], n_salts=4, entropy_col="id")
    got = (
        j.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("fv").alias("s"),
             F.sum("dv").alias("d"))
        .toPandas()
        .set_index("k")
        .sort_index()
    )
    want = (
        facts.join(dim, "k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("fv").alias("s"),
             F.sum("dv").alias("d"))
        .toPandas()
        .set_index("k")
        .sort_index()
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, want)
    # the physical plan must exercise the shuffle-join path: a broadcast
    # would silently bypass the skew machinery on small test inputs
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, plan


def test_salted_join_outer_semantics(spark):
    """Left-outer salted join keeps unmatched fact rows exactly once
    (they match in exactly one salt bucket — or none)."""
    from ionex_spark.operators import skew

    facts = spark.createDataFrame(
        [(1, 0, 5), (2, 99, 6)], "id bigint, k bigint, fv bigint"
    )
    dim = spark.createDataFrame([(0, 7)], "k bigint, dv bigint")
    got = (
        skew.salted_join(facts, dim, ["k"], n_salts=4, how="left")
        .orderBy("id")
        .toPandas()
    )
    assert len(got) == 2
    assert got.loc[0, "dv"] == 7
    assert got.loc[1, "dv"] != got.loc[1, "dv"] or got.loc[1, "dv"] is None  # NaN
