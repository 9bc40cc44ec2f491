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


def session_suffix(spark: SparkSession) -> str:
    """Alnum-filtered applicationId — the per-session table-name suffix
    gate queries use so two local sessions never race on one managed
    location (one definition; queries and tests must agree)."""
    return "".join(ch for ch in spark.sparkContext.applicationId if ch.isalnum())


def _warehouse_path(spark: SparkSession) -> str | None:
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    return wh.path if wh.scheme in ("", "file") else None


def purge_session_tables(
    spark: SparkSession,
    prefix: str,
    keep_suffix: str | None = None,
    max_age_s: float = 3600.0,
) -> None:
    """Remove PRIOR sessions' leftover per-session tables: every local
    warehouse directory starting with ``prefix`` whose name does not end
    with ``keep_suffix`` AND whose mtime is older than ``max_age_s``.
    Per-suffix names make concurrent sessions safe but orphan one
    directory set per run — gate queries call this with their own suffix
    so the warehouse stays bounded.  The age guard is what keeps a LIVE
    concurrent session's table (minutes old) safe from deletion; only
    genuinely abandoned directories (an hour-plus) are reclaimed."""
    import time

    root = _warehouse_path(spark)
    if root is None or not os.path.isdir(root):
        return
    now = time.time()
    for d in os.listdir(root):
        if d.startswith(prefix.lower()) and (
            keep_suffix is None or not d.endswith(keep_suffix.lower())
        ):
            path = os.path.join(root, d)
            try:
                if now - os.path.getmtime(path) < max_age_s:
                    continue
            except OSError:
                continue
            # backtick-quote: a stale directory name with a dash/dot is
            # not a bare SQL identifier; and a malformed name must degrade
            # to rmtree-only cleanup, not fail the calling gate query
            try:
                spark.sql(f"DROP TABLE IF EXISTS `{d}`")
            except Exception:
                pass
            shutil.rmtree(path, ignore_errors=True)


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
    both sides are sorted).

    OVERWRITE semantics include clearing a previous SESSION's orphaned
    managed-table directory (a fresh in-memory catalog does not know it,
    and saveAsTable refuses the location otherwise).  Consequence: a
    CONCURRENTLY-RUNNING session using the same fixed table name would
    lose its data mid-scan — name tables per session (session_suffix)
    when more than one local session can exist.  Local-fs only by
    design: a persistent metastore's DROP TABLE already removes managed
    data, so the path never exists there."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        root = _warehouse_path(spark)
        if root is not None:
            loc = os.path.join(root, table.lower())
            if os.path.exists(loc):
                shutil.rmtree(loc)
    except Exception:
        pass
    # hash-repartition to the bucket count FIRST: bucketBy writes one
    # file per (input partition x non-empty bucket), so an N-partition
    # input yields up to N*buckets small files; repartitioning on the
    # bucket key (same Murmur3 hash as the bucket assignment) makes each
    # task own exactly one bucket -> `buckets` well-sized files (guide
    # §6 "small files hurt twice"; layout-only, results unchanged)
    w = (
        df.repartition(buckets, key)
        .write.format("parquet").mode("overwrite").bucketBy(buckets, key)
    )
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
