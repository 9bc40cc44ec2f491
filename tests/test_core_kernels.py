"""Golden fixtures from /root/reference/src/cell/mod.rs:833-961 (FIXTURES.md §2.1-2.2)."""

import numpy as np
import pytest

from ionex_spark.core import bilinear, bilinear_unit, temporal_interp, temporal_weights


# unit cell at origin; corners given as (sw, se, nw, ne)
@pytest.mark.parametrize(
    "corners,point,expected",
    [
        ((1, 1, 1, 1), (0.5, 0.5), 1.0),
        ((1, 0, 0, 0), (0.5, 0.5), 0.25),
        ((1, 0, 0, 0), (0.1, 0.1), 0.81),
        ((1, 0, 0, 0), (0.01, 0.01), 0.9801),
        ((1, 0, 0, 0), (0.0, 0.0), 1.0),
    ],
)
def test_bilinear_goldens(corners, point, expected):
    sw, se, nw, ne = corners
    x, y = point
    got = bilinear(x, y, 0.0, 0.0, 1.0, 1.0, sw, se, nw, ne)
    assert got == pytest.approx(expected, abs=1e-12)


def test_bilinear_outside_is_nan():
    # containment pre-check (src/cell/mod.rs:413-415) -> NULL in the engine
    assert np.isnan(bilinear(1.5, 0.5, 0.0, 0.0, 1.0, 1.0, 1, 1, 1, 1))
    assert np.isnan(bilinear(0.5, -0.1, 0.0, 0.0, 1.0, 1.0, 1, 1, 1, 1))


def test_bilinear_coefficient_assignment():
    # p (latitude fraction) weights SE; q (longitude fraction) weights NW —
    # the reference's exact pairing (src/cell/mod.rs:421-429).
    # point with p=0.25 (lat), q=0.75 (lon):
    v = bilinear_unit(0.25, 0.75, 0.0, 1.0, 0.0, 0.0)  # only SE corner hot
    assert v == pytest.approx(0.25 * (1 - 0.75))
    v = bilinear_unit(0.25, 0.75, 0.0, 0.0, 1.0, 0.0)  # only NW corner hot
    assert v == pytest.approx(0.75 * (1 - 0.25))


def test_bilinear_non_unit_cell():
    # 2.5 x 5.0 degree cell anchored at (-30, 10): midpoint of const field
    got = bilinear(-27.5, 11.25, -30.0, 10.0, 5.0, 2.5, 4, 4, 4, 4)
    assert got == pytest.approx(4.0)


def test_temporal_midpoint():
    # const-1.0 maps at t0, t0+30s -> t0+15s = 1.0 (src/cell/mod.rs:911-961)
    assert temporal_interp(15.0, 0.0, 30.0, 1.0, 1.0) == pytest.approx(1.0)


def test_temporal_weights_linear():
    w0, w1 = temporal_weights(10.0, 0.0, 30.0)
    assert w0 == pytest.approx(2.0 / 3.0)
    assert w1 == pytest.approx(1.0 / 3.0)
    # exactness at bracket ends
    assert temporal_weights(0.0, 0.0, 30.0)[0] == 1.0
    assert temporal_weights(30.0, 0.0, 30.0)[1] == 1.0


def test_temporal_outside_bracket_is_nan():
    assert np.isnan(temporal_interp(45.0, 0.0, 30.0, 1.0, 1.0))
    assert np.isnan(temporal_interp(-1.0, 0.0, 30.0, 1.0, 1.0))


def test_vectorized_shapes():
    t = np.array([0.0, 15.0, 30.0, 45.0])
    v = temporal_interp(t, 0.0, 30.0, 1.0, 3.0)
    np.testing.assert_allclose(v[:3], [1.0, 2.0, 3.0])
    assert np.isnan(v[3])
