"""Distributed IONEX ingest/export round-trip (reference reciprocity gate,
src/tests/toolkit.rs:10-50, through Spark this time)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

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


def test_rollup_export_reparse_roundtrip(spark, tmp_path):
    """Full raster loop over DRIVER data: synthetic event points ->
    per-cell mean-TEC rollup on the CKMG grid -> quantize -> distributed
    IONEX export -> distributed re-ingest -> every written cell parses
    back bit-identical (absent cells become the 9999 sentinel and stay
    absent).  This is the aggregate->raster->file->reparse composition a
    production export actually runs, not a synthetic-grid reciprocity."""
    import numpy as np

    from ionex_spark.core.linspace import ckmg_grid
    from ionex_spark.core.ionex_io import IonexHeader
    from ionex_spark.functions import sqlgen
    from ionex_spark.functions.sqlgen import GRID

    n_slots = 3
    pts = spark.range(20000).selectExpr(
        "id",
        f"{sqlgen.lat_from_id_sql('id')} as lat",
        f"{sqlgen.lon_from_id_sql('id')} as lon",
        "id % 3 as slot",
    )
    rollup = (
        pts.selectExpr(
            "slot",
            f"{sqlgen.lat_idx_sql('lat')} as lat_i",
            f"{sqlgen.lon_idx_sql('lon')} as lon_i",
        )
        .groupBy("slot", "lat_i", "lon_i")
        .agg(F.count(F.lit(1)).alias("n"))
        # quantized "TEC" = clamped count (deterministic, 0..9998 range)
        .selectExpr("slot", "lat_i", "lon_i", "least(n, 9998) as tecu_q")
    )
    tp = rollup.selectExpr(
        "timestamp '2022-01-02 00:00:00' + make_interval(0,0,0,0,slot,0,0)"
        " as epoch",
        f"cast({sqlgen.GRID.lat0!r} as double) + lat_i"
        f" * cast({GRID.dlat!r} as double) as lat",
        f"cast({GRID.lon0!r} as double) + lon_i"
        f" * cast({GRID.dlon!r} as double) as lon",
        "cast(450.0 as double) as alt",
        "tecu_q",
    )
    epochs = (
        np.datetime64("2022-01-02T00:00:00")
        + np.arange(n_slots) * np.timedelta64(3600, "s")
    ).astype("datetime64[s]")
    hdr = IonexHeader(
        grid=ckmg_grid(),
        interval_s=3600,
        epoch_first=epochs[0],
        epoch_last=epochs[-1],
        number_of_maps=n_slots,
        exponent=-1,
        comments=["rollup export round trip"],
    )
    out = str(tmp_path / "ROLL0010.22I")
    export_ionex(tp, hdr, out)
    back = read_ionex(spark, out).selectExpr(
        "cast((unix_timestamp(epoch) - unix_timestamp("
        "timestamp '2022-01-02 00:00:00')) / 3600 as bigint) as slot",
        f"cast(round((lat - cast({GRID.lat0!r} as double))"
        f" / cast({GRID.dlat!r} as double)) as bigint) as lat_i",
        f"cast(round((lon - cast({GRID.lon0!r} as double))"
        f" / cast({GRID.dlon!r} as double)) as bigint) as lon_i",
        "tecu_q",
    )
    want = rollup.toPandas().set_index(["slot", "lat_i", "lon_i"]).sort_index()
    got = back.toPandas().set_index(["slot", "lat_i", "lon_i"]).sort_index()
    assert len(want) == len(got)
    assert (want["tecu_q"] == got["tecu_q"]).all()
