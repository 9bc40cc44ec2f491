"""Bucketed tables — shuffle-free co-located joins (SURVEY.md §4.2,
"co-locate joins via bucketing").

At 100 TB the dominant cost of a repeated big-big equi-join (e.g. IVF
probe lists joined to a query stream, or tec_points re-joined across
pipeline runs) is re-shuffling the large side every run.  Writing the
table BUCKETED by the join key amortizes that shuffle into the write:
both sides hash-partitioned into the same bucket count on disk, so Spark
plans a SortMergeJoin with ZERO Exchange (asserted in
tests/test_bucketed.py).

Local parquet + the session catalog stand in for the warehouse; on a real
cluster the same calls target the production catalog unchanged.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Write df as a parquet table bucketed (and optionally sorted) by
    ``key``.  Sorting within buckets lets the co-located join skip its
    sort as well (plan shows SortMergeJoin without preceding Sort when
    both sides are sorted)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # A fresh in-memory catalog does not know about a PREVIOUS session's
    # managed-table directory, and saveAsTable refuses to reuse the
    # orphaned location (LOCATION_ALREADY_EXISTS) — clear it.  Local-fs
    # only by design: a persistent metastore's DROP TABLE above already
    # removed managed data, so the path never exists there.
    try:
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
        if wh.scheme in ("", "file"):
            loc = os.path.join(wh.path, table.lower())
            if os.path.exists(loc):
                shutil.rmtree(loc)
    except Exception:
        pass
    w = df.write.format("parquet").mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
    force_smj: bool = False,
) -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket
    count — planned WITHOUT any Exchange on either side.

    ``force_smj`` adds a MERGE join hint so the co-located SortMergeJoin
    plan is exercised even when one side is small enough to broadcast
    (fixtures, plan tests); production leaves it off and lets Catalyst
    pick broadcast when that is genuinely cheaper."""
    left = spark.read.table(left_table)
    if force_smj:
        left = left.hint("merge")
    right = spark.read.table(right_table)
    return left.join(right, key, how)
