"""Hierarchical cell encoding invariants (ionex_spark.core.cellid)."""

import numpy as np
import pytest

from ionex_spark.core import (
    cell_decode,
    cell_encode,
    cell_parent,
    cell_ring,
    cell_to_latlon,
)


def test_res0_two_cells():
    # res 0: 1 lat row x 2 lon cols
    west = cell_encode(0.0, -90.0, 0)
    east = cell_encode(0.0, 90.0, 0)
    assert west != east
    r, li, lo = cell_decode(np.array([west, east]))
    np.testing.assert_array_equal(r, [0, 0])
    np.testing.assert_array_equal(li, [0, 0])
    np.testing.assert_array_equal(lo, [0, 1])


def test_encode_decode_center_roundtrip():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-89.9, 89.9, 1000)
    lon = rng.uniform(-180.0, 180.0, 1000)
    for res in (3, 8, 15):
        c = cell_encode(lat, lon, res)
        clat, clon = cell_to_latlon(c)
        edge = 180.0 / (1 << res)
        assert np.all(np.abs(clat - lat) <= edge / 2 + 1e-9)
        dlon = np.abs(clon - lon)
        dlon = np.minimum(dlon, 360.0 - dlon)
        assert np.all(dlon <= edge / 2 + 1e-9)
        # re-encoding the center is idempotent
        np.testing.assert_array_equal(cell_encode(clat, clon, res), c)


def test_lon_wrap():
    res = 6
    assert cell_encode(10.0, 180.0, res) == cell_encode(10.0, -180.0, res)
    assert cell_encode(10.0, 540.0, res) == cell_encode(10.0, 180.0, res)
    assert cell_encode(10.0, 179.999, res) != cell_encode(10.0, -180.0, res)


def test_pole_clamp():
    res = 4
    c = cell_encode(90.0, 0.0, res)
    _, li, _ = cell_decode(c)
    assert li == (1 << res) - 1


def test_parent_contains_child():
    lat, lon = 47.6, -122.3
    child = cell_encode(lat, lon, 12)
    parent = cell_parent(child, 7)
    assert parent == cell_encode(lat, lon, 7)


def test_parent_vectorized():
    c = cell_encode(np.array([1.0, 2.0]), np.array([3.0, 4.0]), 10)
    p = cell_parent(c, 5)
    np.testing.assert_array_equal(
        p, cell_encode(np.array([1.0, 2.0]), np.array([3.0, 4.0]), 5)
    )


def test_ring_interior():
    c = int(cell_encode(10.0, 10.0, 6))
    ring = cell_ring(c, 1)
    assert len(ring) == 9 and c in ring
    ring2 = cell_ring(c, 2)
    assert len(ring2) == 25
    assert set(ring).issubset(set(ring2))


def test_ring_pole_clamps_rows():
    res = 4
    top = int(cell_encode(89.0, 0.0, res))  # top lat row
    ring = cell_ring(top, 1)
    assert len(ring) == 6  # 2 lat rows x 3 lon cols


def test_ring_dateline_wraps():
    res = 4
    c = int(cell_encode(0.0, -179.0, res))  # westmost lon col
    ring = cell_ring(c, 1)
    assert len(ring) == 9
    _, _, los = cell_decode(ring)
    nlon = 1 << (res + 1)
    assert 0 in los and (nlon - 1) in los  # wrapped across the dateline


def test_resolution_bounds():
    with pytest.raises(ValueError):
        cell_encode(0.0, 0.0, 28)
