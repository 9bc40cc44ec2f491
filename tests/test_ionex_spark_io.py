"""Distributed IONEX ingest/export round-trip (reference reciprocity gate,
src/tests/toolkit.rs:10-50, through Spark this time)."""

import numpy as np
import pytest

from ionex_spark.core import synth
from ionex_spark.core.ionex_io import read_ionex_file, write_ionex_file
from ionex_spark.sources.ionex_source import export_ionex, read_header, read_ionex
from tests.test_core_ionex_io import make_grids, make_header

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def ionex_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("ionex")
    hdr = make_header(3)
    epochs, dense = make_grids(3, field="smooth")
    write_ionex_file(str(d / "CKMG0010.22I"), hdr, epochs, dense)
    # second file: next day span, gzip, with a hole
    hdr2 = make_header(2)
    ep2, dense2 = make_grids(2)
    dense2[1, 3, 4] = 9999
    write_ionex_file(str(d / "CKMG0020.22I.gz"), hdr2, ep2, dense2)
    return d


def test_distributed_ingest_counts(spark, ionex_files):
    df = read_ionex(spark, str(ionex_files)).cache()
    per_file = {
        r.src_file.split("/")[-1]: r["count"]
        for r in df.groupBy("src_file").count().collect()
    }
    full = synth.GRID_NLAT * synth.GRID_NLON
    assert per_file["CKMG0010.22I"] == 3 * full
    assert per_file["CKMG0020.22I.gz"] == 2 * full - 1  # the planted hole
    assert df.filter("tecu_q = 9999").count() == 0  # sentinel dropped
    assert df.filter("exp != -1").count() == 0


def test_ingest_values_match_core_parser(spark, ionex_files):
    df = read_ionex(spark, str(ionex_files / "CKMG0010.22I"))
    got = (
        df.filter("epoch = timestamp '2022-01-02 01:00:00'")
        .orderBy("lat", "lon")
        .toPandas()
    )
    _, epochs, tec, _ = read_ionex_file(str(ionex_files / "CKMG0010.22I"))
    # dense row 0 = north; long order here is lat ascending
    want = tec[1][::-1].ravel()
    np.testing.assert_array_equal(got["tecu_q"].to_numpy(), want)


def test_header_peek(ionex_files):
    h = read_header(str(ionex_files / "CKMG0020.22I.gz"))
    assert h.interval_s == 3600
    assert len(h.grid.lat) == synth.GRID_NLAT
    assert h.exponent == -1


def test_spark_export_roundtrip(spark, ionex_files, tmp_path):
    src = str(ionex_files / "CKMG0010.22I")
    pts = read_ionex(spark, src)
    hdr = read_header(src)
    out = str(tmp_path / "EXPG0010.22I")
    export_ionex(pts, hdr, out)
    _, ep_a, tec_a, _ = read_ionex_file(src)
    _, ep_b, tec_b, _ = read_ionex_file(out)
    np.testing.assert_array_equal(ep_a, ep_b)
    np.testing.assert_array_equal(tec_a, tec_b)  # byte-value reciprocity
