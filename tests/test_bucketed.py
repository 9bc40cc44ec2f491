"""Bucketed co-located joins plan with zero Exchange (the amortized-
shuffle pattern for repeated big-big joins at 100 TB)."""

import pytest

from ionex_spark.sources import bucketed as bk

pytestmark = pytest.mark.spark


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cobucketed_join_has_no_exchange(spark):
    a = spark.range(10_000).selectExpr("id as k", "id * 2 as va")
    b = spark.range(5_000).selectExpr("id as k", "id * 3 as vb")
    bk.write_bucketed(a, "bk_a", "k", buckets=8)
    bk.write_bucketed(b, "bk_b", "k", buckets=8)
    try:
        # disable broadcast so the join exercises the bucketed SMJ path
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = bk.cobucketed_join(spark, "bk_a", "bk_b", "k")
            plan = _plan(j)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan
            # values correct: 5k matching keys
            assert j.count() == 5_000
            row = j.filter("k = 7").first()
            assert (row.va, row.vb) == (14, 21)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_bucketed_ivf_lists_aggregate_no_exchange(spark):
    """IVF corpus lists written bucketed by list_id: per-list statistics
    (the index maintenance pass a real IVF store runs repeatedly)
    aggregate WITHOUT any Exchange — the one-time assign shuffle is
    amortized into the bucketed write."""
    from pyspark.sql import functions as F

    from ionex_spark.operators import similarity as sim

    emb = spark.range(2_000).selectExpr(
        "id as vec_id",
        "transform(sequence(0, 15), d -> cast((id * 7 + d * 3) % 11 - 5"
        " as float)) as embedding",
    )
    cent = emb.filter("vec_id % 500 = 0")
    lists = sim.ivf_assign(emb, cent)
    bk.write_bucketed(lists, "bk_ivf_lists", "list_id", buckets=4)
    try:
        corpus_lists = spark.read.table("bk_ivf_lists")
        per_list = corpus_lists.groupBy("list_id").agg(
            F.count(F.lit(1)).alias("n"), F.min("vec_id").alias("min_id")
        )
        plan = _plan(per_list)
        assert "Exchange" not in plan
        assert per_list.count() == cent.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_ivf_lists")


def test_gate_bucketed_join_query_plan_and_values(spark):
    """The driver-gated bucketed_join_rollup query: the underlying join
    must be a zero-Exchange SortMergeJoin over the two bucketed tables,
    and the rollup must match the plain shuffled join."""
    from pyspark.sql import functions as F

    from ionex_spark.plans.queries_ref import (
        bucketed_join_frames,
        bucketed_join_rollup,
    )

    sf = "/root/testdata/sf0.001"
    try:
        j = bucketed_join_frames(spark, sf)
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        got = {
            (r.o_orderstatus, r.c_mktsegment): (r.n, r.revenue)
            for r in bucketed_join_rollup(spark, sf).collect()
        }
        o = spark.read.parquet(f"{sf}/orders.parquet")
        c = spark.read.parquet(f"{sf}/customer.parquet")
        want = {
            (r.o_orderstatus, r.c_mktsegment): (r.n, r.revenue)
            for r in o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("o_orderstatus", "c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.expr(
                    "cast(sum(cast(o_totalprice as decimal(18,2)))"
                    " as double)"
                ).alias("revenue"),
            )
            .collect()
        }
        assert got == want
    finally:
        suffix = bk.session_suffix(spark)
        spark.sql(f"DROP TABLE IF EXISTS gate_bucketed_orders_{suffix}")
        spark.sql(f"DROP TABLE IF EXISTS gate_bucketed_customer_{suffix}")
