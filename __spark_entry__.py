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
    """Registry entries, riskiest first: the driver's oracle gate caps at
    the first 50 in iteration order, so entries are yielded by
    (priority desc, registration order) — novel/recently-changed queries
    always fall inside the gate, only trivial long-stable ones can drop
    out (ionex_spark.plans.queries.ordered_names)."""
    q = _registry()
    return {name: q.QUERIES[name] for name in q.ordered_names()}


def oracle_sql() -> dict[str, str]:
    q = _registry()
    return {
        name: q.ORACLES[name]
        for name in q.ordered_names()
        if name in q.ORACLES
    }
