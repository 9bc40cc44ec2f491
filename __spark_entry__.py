"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship spatial-join + tile-assignment query at
sf0.001; ``queries()``/``oracle_sql()`` expose the engine's operator
registry (ionex_spark.plans.queries) for the driver's DuckDB oracle gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    """Import all query modules (side-effect: registry population)."""
    from ionex_spark.plans import queries, queries_data, queries_ref  # noqa: F401

    return queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    QUERIES = _registry().QUERIES

    return QUERIES["tile_bilinear"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_registry().QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_registry().ORACLES)
