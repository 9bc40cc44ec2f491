"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship spatial-join + tile-assignment query at
sf0.001; ``queries()``/``oracle_sql()`` expose the engine's operator
registry (ionex_spark.plans.queries) for the driver's DuckDB oracle gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ionex_spark.plans.queries import QUERIES

    return QUERIES["tile_bilinear"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ionex_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ionex_spark.plans.queries import ORACLES

    return dict(ORACLES)
