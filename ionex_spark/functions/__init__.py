"""Column-expression builders shared by the Spark engine and the SQL oracle."""

from ionex_spark.functions.sqlgen import (  # noqa: F401
    GRID,
    bilinear_sql,
    cell_id_sql,
    corner_tec_sql,
    lat_from_id_sql,
    lon_from_id_sql,
    lat_idx_sql,
    lon_idx_sql,
    slot_from_id_sql,
    tsec_from_id_sql,
)
