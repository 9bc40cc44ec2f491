"""Physical table layout for 10^12-row scale — partitioning & bucketing.

What Iceberg's ``bucket(N, image_id) + days(ts)`` spec gives on a real
catalog, expressed with vanilla parquet so it runs here (SURVEY.md §7
TableIO fallback):

- tile outputs are PARTITIONED BY a coarse parent cell (res-3: 128 dirs)
  -> spatial queries prune partitions at planning time (PartitionFilters);
- within a partition, files are sorted by the fine cell id
  (sortWithinPartitions) -> parquet min/max column stats skip row groups;
- image/point tables bucket by id hash (``pmod(xxhash64(id), N)``) so
  joins/groupBys on id can co-locate without a full shuffle when both
  sides share the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ionex_spark.functions import sqlgen

PARENT_RES = 3


def write_tiles_partitioned(
    tiled: DataFrame, path: str, tile_col: str = "tile_id", tile_res: int = 6
) -> None:
    """Partition by the res-PARENT_RES ancestor of the tile, sort within
    partitions by the fine tile id."""
    out = tiled.withColumn(
        "p_cell",
        F.expr(sqlgen.cell_parent_sql(tile_col, tile_res, PARENT_RES)),
    )
    (
        out.repartition("p_cell")
        .sortWithinPartitions(tile_col)
        .write.mode("overwrite")
        .partitionBy("p_cell")
        .parquet(path)
    )


def read_tiles_pruned(
    spark: SparkSession, path: str, lat: float, lon: float
) -> DataFrame:
    """Read only the partition containing (lat, lon) — the planner turns
    the p_cell equality into a PartitionFilter (no data files from other
    partitions are even listed)."""
    from ionex_spark.core.cellid import cell_encode

    p_cell = int(cell_encode(lat, lon, PARENT_RES))
    return spark.read.parquet(path).filter(F.col("p_cell") == p_cell)


def bucket_by_id(df: DataFrame, id_col: str, n_buckets: int) -> DataFrame:
    """Hash-bucket column for co-located joins (Iceberg bucket(N, id))."""
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    )
