"""Golden fixtures from /root/reference/src/linspace.rs:192-310, src/grid.rs (FIXTURES.md §2.4)."""

import numpy as np

from ionex_spark.core import Linspace
from ionex_spark.core.linspace import Grid, ckmg_grid


def test_lengths():
    assert len(Linspace(1.0, 180.0, 1.0)) == 180
    assert len(Linspace(1.0, 180.0, 0.5)) == 359  # 1..180 by 0.5 inclusive
    assert len(Linspace(350.0, 350.0, 0.0)) == 1


def test_ckmg_grid_dims():
    g = ckmg_grid()
    assert len(g.lat) == 71
    assert len(g.lon) == 73
    assert len(g.alt) == 1
    assert g.is_worldwide()
    assert g.cell_counts() == (70, 72)


def test_nearest_lower():
    lat = Linspace(-87.5, 87.5, 2.5)
    assert lat.nearest_lower(-85.0) == -85.0
    lon = Linspace(-180.0, 180.0, 5.0)
    assert lon.nearest_lower(-179.0) == -180.0


def test_nearest_above():
    lon = Linspace(-180.0, 180.0, 5.0)
    assert lon.nearest_above(-179.0) == -175.0
    assert lon.nearest_above(-180.0) == -180.0


def test_nearest_bounds():
    lat = Linspace(-87.5, 87.5, 2.5)
    assert np.isnan(lat.nearest_lower(-88.0))
    assert np.isnan(lat.nearest_above(88.0))
    assert lat.nearest_lower(89.0) == 87.5  # clamped to top line


def test_descending_axis_values():
    lat = Linspace(87.5, -87.5, -2.5)
    v = lat.values()
    assert v[0] == 87.5 and v[-1] == -87.5
    assert len(v) == 71
    np.testing.assert_allclose(np.diff(v), -2.5)


def test_stretch_resample_invariants():
    ls = Linspace(1.0, 10.0, 0.5)
    st = ls.stretched(2.0)
    assert (st.start, st.end, st.spacing) == (2.0, 20.0, 0.5)
    rs = ls.resampled(2.0)
    assert (rs.start, rs.end, rs.spacing) == (1.0, 10.0, 1.0)


def test_grid_spec_line_parse():
    # grid-spec 80-col line fields (src/grid.rs:154-198) via the io splitter
    from ionex_spark.core.ionex_io import _split_grid_triple

    content = "     2.5-180.0 180.0   5.0 350.0"
    lat_field = content[2:8]
    assert float(lat_field) == 2.5
    a, b, c = _split_grid_triple("  -180.0 180.0   5.0")
    assert (float(a), float(b), float(c)) == (-180.0, 180.0, 5.0)


def test_worldwide_predicate_negative():
    g = Grid(
        lat=Linspace(-30.0, 30.0, 2.5),
        lon=Linspace(-30.0, 30.0, 5.0),
        alt=Linspace(350.0, 350.0, 0.0),
    )
    assert not g.is_worldwide()


def test_nearest_single_point_axis():
    alt = Linspace(350.0, 350.0, 0.0)
    assert alt.nearest_lower(350.0) == 350.0
    assert alt.nearest_lower(400.0) == 350.0
    assert np.isnan(alt.nearest_lower(300.0))
    assert alt.nearest_above(350.0) == 350.0
    assert alt.nearest_above(300.0) == 350.0
    assert np.isnan(alt.nearest_above(400.0))
