"""Physical-plan invariants the 100 TB design depends on."""

import pytest

pytestmark = pytest.mark.spark


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_images_bytes_column_pruned(spark, tmp_path):
    """Payload discipline (SURVEY.md §4.2): when the pipeline doesn't
    decode, the binary column must not even be READ from parquet."""
    from ionex_spark.operators import spatial
    from ionex_spark.sources.images import images_df

    path = str(tmp_path / "imgs")
    images_df(spark, 200, partitions=2).write.parquet(path)
    imgs = spark.read.parquet(path)
    lean = spatial.spatial_join_bilinear(imgs, spatial.build_tec_cells(spark))
    lean = lean.select("image_id", "tec")
    plan = _plan(lean)
    scan = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan, plan
    # compare only the ReadSchema struct (the line also contains the tmp
    # path, which happens to include this test's name)
    schema = scan[0].split("ReadSchema:")[1]
    assert "bytes" not in schema
    assert "caption" not in schema


def test_filter_pushdown_to_parquet(spark, tmp_path):
    """Predicates on scan columns must reach the parquet reader."""
    from ionex_spark.sources.images import images_df

    path = str(tmp_path / "imgs2")
    images_df(spark, 200, partitions=2).write.parquet(path)
    df = spark.read.parquet(path).filter("w = 32").select("image_id", "w")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(w), EqualTo(w,32)]" in plan.replace(
        "'", ""
    ) or "PushedFilters" in plan and "EqualTo(w,32)" in plan


def test_knn_has_no_exchange_at_all(spark):
    """Top-k is computed inside the row (array_sort + slice + posexplode):
    the plan must contain NO join and NO Exchange of any kind."""
    from ionex_spark.functions import sqlgen
    from ionex_spark.operators import knn as knn_ops

    pts = spark.range(100).selectExpr(
        "id",
        f"{sqlgen.lat_from_id_sql('id')} as lat",
        f"{sqlgen.lon_from_id_sql('id')} as lon",
    )
    plan = _plan(knn_ops.knn_grid_points(pts, k=4))
    assert "Join" not in plan
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "Generate" in plan  # the final posexplode


def test_ivf_assign_is_narrow(spark):
    """Nearest-centroid assignment is a per-row fold over one broadcast
    array row: no shuffle Exchange, no Window, no row amplification on the
    corpus side (the only join is the 1-row BroadcastNestedLoop)."""
    from ionex_spark.operators import similarity as sim

    emb = spark.range(200).selectExpr(
        "id as vec_id",
        "transform(sequence(0, 7), d -> cast((id * 7 + d * 3) % 11 - 5"
        " as float)) as embedding",
    )
    cents = emb.filter("vec_id % 50 = 0")
    plan = _plan(sim.ivf_assign(emb, cents))
    corpus_side = plan.split("BroadcastExchange")[0]
    assert "Exchange" not in corpus_side
    assert "Window" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1


def test_temporal_join_single_broadcast_probe(spark):
    """The bracket join is ONE BroadcastHashJoin on the packed key."""
    from ionex_spark.functions import sqlgen
    from ionex_spark.operators import spatial

    pts = spark.range(100).selectExpr(
        "id",
        f"{sqlgen.lat_from_id_sql('id')} as lat",
        f"{sqlgen.lon_from_id_sql('id')} as lon",
        f"{sqlgen.tsec_from_id_sql('id')} as tsec",
    )
    cells = spatial.build_tec_cells(spark)
    plan = _plan(spatial.temporal_spatial_join(pts, cells))
    # exactly one join in the point-side pipeline (grid-side pair build
    # happens before the broadcast exchange)
    point_side = plan.split("BroadcastExchange")[0]
    assert point_side.count("BroadcastHashJoin") == 1


def test_tfidf_window_reuses_tf_partitioning(spark):
    """tfidf_top_terms: tokens are repartitioned by doc_id ONCE; the
    (doc_id, token) aggregate and the per-doc ranking window both run on
    that partitioning — no ENSURE_REQUIREMENTS exchange between the tf
    aggregate and the Window, and the rank<=3 limit is pushed below the
    sort (WindowGroupLimit)."""
    import re

    from ionex_spark.plans.queries_data import tfidf_top_terms

    plan = _plan(tfidf_top_terms(spark, "/root/testdata/sf0.001"))
    assert "WindowGroupLimit" in plan
    # the window must sit directly on a REPARTITION_BY_COL exchange, not
    # on an extra ENSURE_REQUIREMENTS reshuffle of the aggregated tf
    window_subtree = plan.split("Window ")[1].split("BroadcastExchange")[0]
    ensure = re.findall(
        r"Exchange hashpartitioning\(doc_id[^)]*\), ENSURE", window_subtree
    )
    assert not ensure, window_subtree[:500]


def test_tile_kring_single_aggregate_exchange(spark):
    """tile_kring_counts: the 3x3 disk explode is a broadcast cross join
    (offsets side) and the ONLY hash-partitioning Exchange is the final
    groupBy(ring_cell) rollup."""
    import re

    from ionex_spark.plans.queries_ref import tile_kring_counts

    plan = _plan(tile_kring_counts(spark, "/root/testdata/sf0.001"))
    hash_exchanges = re.findall(r"Exchange hashpartitioning", plan)
    assert len(hash_exchanges) == 1, plan[:800]
    assert "BroadcastNestedLoopJoin" in plan  # the tiny offsets side


def test_radius_search_broadcast_only(spark):
    """The site side must broadcast; the corpus side must not exchange
    before the final rollup (one Exchange total, keyed by site)."""
    from ionex_spark.functions import sqlgen
    from ionex_spark.operators import geo

    pts = spark.range(500).selectExpr(
        "id",
        f"{sqlgen.lat_from_id_sql('id')} as lat",
        f"{sqlgen.lon_from_id_sql('id')} as lon",
    )
    sites = pts.filter("id % 50 = 0").selectExpr(
        "id as qid", "lat as q_lat", "lon as q_lon"
    )
    plan = _plan(geo.radius_search(pts, sites, 500.0))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # exactly one shuffle: the per-site aggregation
    assert plan.count("Exchange hashpartitioning") == 1


def test_decontam_bench_side_broadcast(spark):
    """The benchmark shingle index joins as the broadcast side — the
    corpus explode must not shuffle for the join."""
    from ionex_spark.operators.decontam import contamination_hits

    corpus = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(50)],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, "w1 w2 w3 w4")], "bench_id bigint, text string"
    )
    plan = _plan(contamination_hits(corpus, bench))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_gap_fill_single_window_partitioning(spark):
    """Both ignore-nulls scans must share ONE window partitioning: a
    single Exchange on the series key feeds forward+backward passes."""
    from ionex_spark.operators.spatial import gap_fill_series

    sparse = spark.range(100).selectExpr(
        "cast(id % 10 as bigint) as k",
        "cast(floor(id / 10) as bigint) as slot",
        "cast(id as double) as tecu",
    ).filter("slot % 3 != 0")
    plan = _plan(gap_fill_series(sparse, 10, keys=["k"]))
    # one exchange for the dense-axis groupBy, one for the window — the
    # two window scans themselves must NOT add separate exchanges
    assert plan.count("Exchange hashpartitioning") <= 2


def test_mixture_sample_is_narrow_no_exchange(spark, tmp_path):
    """corpus_mixture_sample's data path is ONE hash-gated filter: after
    the (separate, tiny) counts pre-agg, the sampled frame itself must
    contain no Exchange — at 100 TB the mixture costs a scan, not a
    shuffle."""
    from ionex_spark.operators import shards as sh

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = sh.corpus_mixture_sample(
        docs, "lang", {"en": 500_000, "zh": 300_000, "de": 200_000}
    )
    assert "Exchange" not in _plan(out)


def test_shard_assign_single_exchange(spark):
    """The two-phase global rank pays exactly ONE Exchange (the bucket
    repartition); the within-bucket sort + window add none."""
    from ionex_spark.operators import shards as sh

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(sh.shard_assign(docs, 16))
    assert plan.count("Exchange") == 1, plan


def test_incremental_dedup_bloom_probe_stage_shapes(spark):
    """The bloom probe side must never shuffle the increment before the
    membership rollup keyed on the probe id, and the filter table join
    is a broadcast."""
    from ionex_spark.operators import dedup as dd

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    inc = docs.selectExpr("doc_id + 9999 as doc_id", "text")
    plan = _plan(dd.incremental_dedup(inc, docs))
    assert "BroadcastHashJoin" in plan  # the m/64-row filter table
    assert "CartesianProduct" not in plan
