"""Partitioned tile layout: pruning actually happens at the scan."""

import pytest
from pyspark.sql import functions as F

from ionex_spark.functions import sqlgen
from ionex_spark.plans import layout

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def tiles_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tiles") / "t")
    tiled = spark.range(20000).selectExpr(
        "id",
        f"{sqlgen.lat_from_id_sql('id')} as lat",
        f"{sqlgen.lon_from_id_sql('id')} as lon",
    ).withColumn("tile_id", F.expr(sqlgen.cell_id_sql("lat", "lon", 6)))
    layout.write_tiles_partitioned(tiled, path)
    return path


def test_partition_pruning_in_plan(spark, tiles_path):
    df = layout.read_tiles_pruned(spark, tiles_path, 47.6, -122.3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the p_cell predicate must land in PartitionFilters, not a post-scan
    # Filter over all partitions
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "p_cell" in pf


def test_pruned_read_correct_and_smaller(spark, tiles_path):
    from ionex_spark.core.cellid import cell_encode, cell_parent

    all_rows = spark.read.parquet(tiles_path)
    got = layout.read_tiles_pruned(spark, tiles_path, 47.6, -122.3)
    n_all, n_got = all_rows.count(), got.count()
    assert 0 < n_got < n_all
    # every returned tile really is under that parent cell
    p = int(cell_encode(47.6, -122.3, layout.PARENT_RES))
    tiles = [r.tile_id for r in got.select("tile_id").distinct().collect()]
    assert all(int(cell_parent(t, layout.PARENT_RES)) == p for t in tiles)


def test_bucket_by_id_stable(spark):
    a = layout.bucket_by_id(spark.range(1000), "id", 32).toPandas()
    b = layout.bucket_by_id(spark.range(1000), "id", 32).toPandas()
    assert (a["bucket"] == b["bucket"]).all()
    assert a["bucket"].between(0, 31).all()
    assert a["bucket"].nunique() == 32
