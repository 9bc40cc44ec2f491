"""float32 broadcast corners stay inside the reference's 1e-5 TECu budget
(src/tests/toolkit.rs:116) — the claim behind the bench's corner_dtype."""

import numpy as np
import pytest

from ionex_spark.functions import sqlgen
from ionex_spark.operators import spatial

pytestmark = pytest.mark.spark


def test_f32_corner_error_within_reference_tolerance(spark):
    pts = spark.range(5000).selectExpr(
        "id",
        f"{sqlgen.lat_from_id_sql('id')} as lat",
        f"{sqlgen.lon_from_id_sql('id')} as lon",
        f"{sqlgen.slot_from_id_sql('id')} as slot",
    )
    c64 = spatial.build_tec_cells(spark)
    c32 = spatial.build_tec_cells(spark, corner_dtype="float")
    a = (
        spatial.spatial_join_bilinear(pts, c64)
        .select("id", "tec")
        .toPandas()
        .set_index("id")["tec"]
    )
    b = (
        spatial.spatial_join_bilinear(pts, c32)
        .select("id", "tec")
        .toPandas()
        .set_index("id")["tec"]
    )
    err = np.abs(a.sort_index().to_numpy() - b.sort_index().to_numpy())
    assert err.max() < 1e-5
