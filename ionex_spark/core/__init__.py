"""ionex_spark.core — pure numpy/python kernels (no Spark dependency).

This subpackage is the *oracle*: every Spark operator in
``ionex_spark.operators`` is validated against these array functions on the
same inputs, and the golden values ported from the reference's unit tests
(FIXTURES.md §2) pin the exact numeric semantics.
"""

from ionex_spark.core.quantized import (  # noqa: F401
    find_exponent,
    quantize,
    real_value,
)
from ionex_spark.core.linspace import Linspace, Grid  # noqa: F401
from ionex_spark.core.kernels import (  # noqa: F401
    bilinear,
    bilinear_unit,
    temporal_weights,
    temporal_interp,
)
from ionex_spark.core.cellid import (  # noqa: F401
    cell_encode,
    cell_decode,
    cell_parent,
    cell_ring,
    cell_to_latlon,
)
