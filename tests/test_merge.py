"""IONEX merge semantics (reference qc tests, src/tests/qc.rs:15-103) +
RMS round-trip through the Spark exporter."""

import numpy as np
import pytest

from ionex_spark.core.ionex_io import read_ionex_file, write_ionex_file
from ionex_spark.operators import merge as mg
from ionex_spark.sources.ionex_source import export_ionex, read_header, read_ionex
from tests.test_core_ionex_io import make_grids, make_header

pytestmark = pytest.mark.spark


def test_self_merge_idempotent(spark, tmp_path):
    """Merging a map with itself changes nothing but the FILE MERGE tag."""
    p = str(tmp_path / "A.22I")
    hdr = make_header(2)
    epochs, dense = make_grids(2)
    write_ionex_file(p, hdr, epochs, dense)
    pts = read_ionex(spark, p)
    merged = mg.merge_tec_points(pts, pts)
    assert merged.count() == pts.count()
    h2 = mg.merge_headers(read_header(p), read_header(p))
    assert mg.is_merged(h2)
    assert h2.epoch_first == hdr.epoch_first
    assert h2.epoch_last == hdr.epoch_last
    assert not mg.is_merged(read_header(p))


def test_two_file_merge_spans_and_fills(spark, tmp_path):
    """Two overlapping files: lhs wins on shared keys, rhs fills holes;
    merged header spans min..max epochs (src/header/qc.rs:13-97)."""
    import ionex_spark.core.synth as synth

    pa = str(tmp_path / "A.22I")
    pb = str(tmp_path / "B.22I")
    ha = make_header(2)
    ea, da = make_grids(2)
    da[1, 3, 4] = 9999  # hole in A's second map
    write_ionex_file(pa, ha, ea, da)

    hb = make_header(3)  # B spans one more epoch, different values
    eb, db = make_grids(3)
    db = db + 7
    write_ionex_file(pb, hb, eb, db)

    a = read_ionex(spark, pa)
    b = read_ionex(spark, pb)
    m = mg.merge_tec_points(a, b).cache()
    full = synth.GRID_NLAT * synth.GRID_NLON
    assert m.count() == 3 * full  # union of keys, hole filled by B

    # lhs wins on a shared key
    probe = m.filter(
        "epoch = timestamp '2022-01-02 00:00:00'"
        " and lat = -87.5 and lon = -180.0"
    ).first()
    want_a = da[0, synth.GRID_NLAT - 1, 0]
    assert probe.tecu_q == want_a

    # hole in A filled from B (lat row 3 from north, lon col 4)
    lat_hole = 87.5 - 3 * 2.5
    lon_hole = -180.0 + 4 * 5.0
    hole = m.filter(
        "epoch = timestamp '2022-01-02 01:00:00'"
        f" and lat = {lat_hole} and lon = {lon_hole}"
    ).first()
    assert hole.tecu_q == db[1, 3, 4]

    hm = mg.merge_headers(read_header(pa), read_header(pb))
    assert hm.epoch_first == np.datetime64("2022-01-02T00:00:00")
    assert hm.epoch_last == np.datetime64("2022-01-02T02:00:00")
    assert mg.is_merged(hm)


def test_spark_export_rms_roundtrip(spark, tmp_path):
    """RMS maps survive write -> distributed ingest -> distributed export
    -> parse (the reference's RMS second pass, src/record/formatting.rs)."""
    src = str(tmp_path / "R.22I")
    hdr = make_header(2)
    epochs, dense = make_grids(2)
    rms = np.full_like(dense, 4)
    rms[0, 1, 1] = 9999  # one missing RMS point
    write_ionex_file(src, hdr, epochs, dense, rms)
    pts = read_ionex(spark, src)
    assert pts.filter("rms_q is not null").count() > 0
    out = str(tmp_path / "R_out.22I")
    export_ionex(pts, read_header(src), out)
    _, ep2, tec2, rms2 = read_ionex_file(out)
    np.testing.assert_array_equal(tec2, dense)
    assert rms2 is not None
    np.testing.assert_array_equal(rms2, rms)


def test_merge_rms_fill_rescales_exponent(spark):
    """rms_q filled from rhs is rescaled to the merged row's exponent so
    its REAL value (rms_q * 10^exp) is preserved across files with
    different EXPONENT headers."""
    l = spark.createDataFrame(
        [("2022-01-01 00:00:00", 10.0, 20.0, 450.0, 35, -1, None)],
        "epoch string, lat double, lon double, alt double,"
        " tecu_q long, exp int, rms_q long",
    ).selectExpr("timestamp(epoch) as epoch", "lat", "lon", "alt",
                 "tecu_q", "exp", "rms_q")
    # rhs: same key, rms 350 under exp -2 => real RMS 3.5 TECU
    r = spark.createDataFrame(
        [("2022-01-01 00:00:00", 10.0, 20.0, 450.0, 350, -2, 350)],
        "epoch string, lat double, lon double, alt double,"
        " tecu_q long, exp int, rms_q long",
    ).selectExpr("timestamp(epoch) as epoch", "lat", "lon", "alt",
                 "tecu_q", "exp", "rms_q")
    out = mg.merge_tec_points(l, r).collect()
    assert len(out) == 1
    row = out[0]
    assert row.tecu_q == 35 and row.exp == -1  # lhs wins
    # filled rms rescaled: 350 * 10^(-2 - -1) = 35 (still 3.5 TECU real)
    assert row.rms_q == 35


def test_merge_tecu_fill_rescales_exponent(spark):
    """tecu_q filled from rhs onto an RMS-only lhs row is rescaled to the
    merged exponent, same as rms_q (real value preserved)."""
    l = spark.createDataFrame(
        [("2022-01-01 00:00:00", 10.0, 20.0, 450.0, None, -1, 30)],
        "epoch string, lat double, lon double, alt double,"
        " tecu_q long, exp int, rms_q long",
    ).selectExpr("timestamp(epoch) as epoch", "lat", "lon", "alt",
                 "tecu_q", "exp", "rms_q")
    r = spark.createDataFrame(
        [("2022-01-01 00:00:00", 10.0, 20.0, 450.0, 350, -2, None)],
        "epoch string, lat double, lon double, alt double,"
        " tecu_q long, exp int, rms_q long",
    ).selectExpr("timestamp(epoch) as epoch", "lat", "lon", "alt",
                 "tecu_q", "exp", "rms_q")
    row = mg.merge_tec_points(l, r).collect()[0]
    assert row.exp == -1 and row.rms_q == 30
    # 350 under exp -2 (3.5 TECU) -> 35 under exp -1 (still 3.5 TECU)
    assert row.tecu_q == 35


def test_export_rms_only_point_roundtrip(spark, tmp_path):
    """An RMS-only grid point (NULL tecu_q) must export as the 9999
    sentinel in the TEC raster, not as a garbage int from a NaN cast."""
    import numpy as np

    p = str(tmp_path / "R.22I")
    hdr = make_header(1)
    epochs, dense = make_grids(1)
    rms = np.full_like(dense, 3)
    dense[0, 5, 7] = 9999  # RMS-only point
    write_ionex_file(p, hdr, epochs, dense, rms)
    pts = read_ionex(spark, p)
    out = str(tmp_path / "O.22I")
    export_ionex(pts, read_header(p), out)
    _, _, tec2, rms2 = read_ionex_file(out)
    np.testing.assert_array_equal(tec2, dense)
    np.testing.assert_array_equal(rms2, rms)
    assert tec2[0, 5, 7] == 9999
