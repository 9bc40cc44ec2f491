"""ROI reduction fixture: worldwide -> (-30..30)^2 regional
(reference src/tests/roi.rs:6-37)."""

import numpy as np
import pytest

from ionex_spark.core import synth
from ionex_spark.operators import roi as roi_ops
from ionex_spark.sources.ionex_source import read_header, read_ionex
from ionex_spark.core.ionex_io import write_ionex_file
from tests.test_core_ionex_io import make_grids, make_header

pytestmark = pytest.mark.spark


def test_worldwide_to_regional_bounds(spark, tmp_path):
    p = str(tmp_path / "W.22I")
    hdr = make_header(2)
    epochs, dense = make_grids(2)
    write_ionex_file(p, hdr, epochs, dense)
    assert read_header(p).grid.is_worldwide()

    pts = read_ionex(spark, p)
    reg, new_hdr = roi_ops.to_regional(pts, read_header(p), -30, 30, -30, 30)

    # bounding-rect equality (the reference's assertion shape)
    lat_asc = new_hdr.grid.lat.ascending()
    lon_asc = new_hdr.grid.lon.ascending()
    assert (lat_asc.start, lat_asc.end) == (-30.0, 30.0)
    assert (lon_asc.start, lon_asc.end) == (-30.0, 30.0)
    assert not new_hdr.grid.is_worldwide()
    # orientation preserved (lat axis N->S in the source header)
    assert new_hdr.grid.lat.spacing == hdr.grid.lat.spacing

    got = reg.toPandas()
    assert got["lat"].between(-30, 30).all()
    assert got["lon"].between(-30, 30).all()
    # 25 lat lines x 13 lon lines x 2 epochs
    assert len(got) == 25 * 13 * 2


def test_regional_bounds_snap_inward(spark, tmp_path):
    p = str(tmp_path / "W2.22I")
    hdr = make_header(1)
    epochs, dense = make_grids(1)
    write_ionex_file(p, hdr, epochs, dense)
    pts = read_ionex(spark, p)
    # rect not aligned to the grid: snap inward to grid lines
    _, nh = roi_ops.to_regional(pts, read_header(p), -29.0, 29.0, -29.0, 29.0)
    lat_asc = nh.grid.lat.ascending()
    lon_asc = nh.grid.lon.ascending()
    assert (lat_asc.start, lat_asc.end) == (-27.5, 27.5)
    assert (lon_asc.start, lon_asc.end) == (-25.0, 25.0)


def test_to_worldwide_rewrites_header_only():
    from ionex_spark.core.ionex_io import IonexHeader
    from ionex_spark.core.linspace import Grid, Linspace

    regional = IonexHeader(
        grid=Grid(
            lat=Linspace(30.0, -30.0, -2.5),
            lon=Linspace(-30.0, 30.0, 5.0),
            alt=Linspace(350.0, 350.0, 0.0),
        )
    )
    ww = roi_ops.to_worldwide(regional)
    assert ww.grid.is_worldwide()
    assert ww.grid.lat.spacing == -2.5  # orientation preserved
    assert ww.grid.lon.spacing == 5.0
