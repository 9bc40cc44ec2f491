"""IONEX ASCII write -> parse reciprocity (the reference's own gate,
/root/reference/src/tests/toolkit.rs:10-50; FIXTURES.md §2.6-2.7)."""

import numpy as np
import pytest

from ionex_spark.core.ionex_io import (
    IonexHeader,
    grids_to_long,
    parse_ionex,
    read_ionex_file,
    write_ionex,
    write_ionex_file,
    _fmt_line,
)
from ionex_spark.core.linspace import ckmg_grid
from ionex_spark.core import synth
from ionex_spark.core.kernels import bilinear


def make_header(n_epochs=3):
    g = ckmg_grid()
    return IonexHeader(
        grid=g,
        interval_s=synth.SAMPLING_S,
        epoch_first=synth.EPOCH0,
        epoch_last=synth.EPOCH0 + np.timedelta64((n_epochs - 1) * 3600, "s"),
        number_of_maps=n_epochs,
        exponent=synth.FILE_EXP,
        comments=["synthetic worldwide map"],
    )


def make_grids(n_epochs=3, field="int"):
    slot, lat_i, lon_i, lat, lon, tecu_q = synth.tec_points_arrays(n_epochs, field)
    # pack into grid order: row 0 = northernmost (grid lat starts at 87.5)
    dense = np.full((n_epochs, synth.GRID_NLAT, synth.GRID_NLON), 9999, np.int64)
    dense[slot, synth.GRID_NLAT - 1 - lat_i, lon_i] = tecu_q
    epochs = synth.EPOCH0 + np.arange(n_epochs) * np.timedelta64(3600, "s")
    return epochs.astype("datetime64[s]"), dense


def test_fmt_line_60col():
    # comment wrap goldens (src/lib.rs:1329-1374)
    for desc in ["test", "just a basic comment", "just another lengthy comment"]:
        lines = _fmt_line(desc, "COMMENT")
        assert len(lines) == 1
        assert len(lines[0]) >= 60
        assert lines[0][60:] == "COMMENT"
    long = "x" * 130
    lines = _fmt_line(long, "COMMENT")
    assert len(lines) == -(-130 // 60) == 3
    assert all(l[60:] == "COMMENT" for l in lines)


def test_epoch_line_format_and_parse():
    from ionex_spark.core.ionex_io import _fmt_epoch_body, _parse_epoch

    e = np.datetime64("2022-01-02T00:00:00")
    body = _fmt_epoch_body(e)
    assert body.startswith("  2022     1     2     0     0     0")
    assert _parse_epoch(body) == e


def test_roundtrip_header_and_values():
    hdr = make_header()
    epochs, dense = make_grids()
    text = write_ionex(hdr, epochs, dense)
    h2, ep2, tec2, rms2 = parse_ionex(text)
    assert h2.grid.lat == hdr.grid.lat
    assert h2.grid.lon == hdr.grid.lon
    assert h2.grid.alt == hdr.grid.alt
    assert h2.interval_s == hdr.interval_s
    assert h2.exponent == hdr.exponent
    assert h2.epoch_first == hdr.epoch_first
    assert h2.epoch_last == hdr.epoch_last
    assert h2.number_of_maps == hdr.number_of_maps
    np.testing.assert_array_equal(ep2, epochs)
    np.testing.assert_array_equal(tec2, dense)
    assert rms2 is None


def test_roundtrip_with_rms_and_missing():
    hdr = make_header(2)
    epochs, dense = make_grids(2)
    dense[0, 5, 7] = 9999  # plant a missing point
    rms = np.full_like(dense, 3)
    text = write_ionex(hdr, epochs, dense, rms)
    _, ep2, tec2, rms2 = parse_ionex(text)
    np.testing.assert_array_equal(tec2, dense)
    np.testing.assert_array_equal(rms2, rms)
    assert tec2[0, 5, 7] == 9999


def test_line_widths():
    hdr = make_header(1)
    epochs, dense = make_grids(1)
    text = write_ionex(hdr, epochs, dense)
    for line in text.splitlines():
        if line[60:].strip():
            assert len(line) >= 60
        else:
            assert len(line) <= 80  # 16 x 5-char data cols


def test_gzip_file_roundtrip(tmp_path):
    hdr = make_header(2)
    epochs, dense = make_grids(2)
    p = str(tmp_path / "CKMG0020.22I.gz")
    write_ionex_file(p, hdr, epochs, dense)
    h2, ep2, tec2, _ = read_ionex_file(p)
    np.testing.assert_array_equal(tec2, dense)


def test_grids_to_long_drops_sentinel():
    hdr = make_header(1)
    epochs, dense = make_grids(1)
    dense[0, 0, 0] = 9999
    long = grids_to_long(hdr, epochs, dense)
    assert len(long["tecu_q"]) == synth.GRID_NLAT * synth.GRID_NLON - 1
    assert np.all(long["tecu_q"] != 9999)


def test_record_section_comment_tolerated():
    """A legal COMMENT inside the record section must be skipped, not
    parsed as fixed-width data (reference record parser logs & continues,
    src/record/parsing.rs data arm)."""
    hdr = make_header(1)
    epochs, dense = make_grids(1)
    lines = write_ionex(hdr, epochs, dense).splitlines()
    idx = [i for i, l in enumerate(lines) if "EPOCH OF CURRENT MAP" in l][0]
    lines.insert(idx + 1, f"{'mid-record note':<60}COMMENT")
    _, _, tec2, _ = parse_ionex("\n".join(lines) + "\n")
    np.testing.assert_array_equal(tec2, dense)


def test_rms_only_points_survive_ingest():
    """Grid points with an RMS value but no TEC value are kept (reference
    RMS branch inserts a default-TEC key, src/record/parsing.rs); tecu_q
    comes back NaN (NULL on the Spark side)."""
    hdr = make_header(1)
    epochs, dense = make_grids(1)
    rms = np.full_like(dense, 3)
    dense[0, 5, 7] = 9999  # TEC missing, RMS present at the same point
    long = grids_to_long(hdr, epochs, dense, rms)
    assert len(long["tecu_q"]) == synth.GRID_NLAT * synth.GRID_NLON
    assert np.isnan(long["tecu_q"]).sum() == 1
    assert not np.isnan(long["rms_q"]).any()


def test_per_row_lon_spec_subset():
    """A LAT row carrying its OWN lon spec (subset of the header axis)
    must place values at the right columns (IONEX GridSpecs semantics,
    src/record/parsing.rs)."""
    hdr = make_header(1)
    epochs, dense = make_grids(1)
    g = hdr.grid
    lines = write_ionex(hdr, epochs, dense).splitlines()
    # find the first LAT spec line and replace that row: 3 values at
    # stride 2*dlon starting at lon column 4
    si = [i for i, l in enumerate(lines) if "LAT/LON1/LON2/DLON/H" in l][0]
    lat_v = float(lines[si][2:8])
    lon1 = g.lon.start + 4 * g.lon.spacing
    dlon = 2 * g.lon.spacing
    lon2 = lon1 + 2 * dlon
    spec = f"  {lat_v:6.1f}{lon1:6.1f}{lon2:6.1f}{dlon:6.1f}{g.alt.start:6.1f}"
    # data lines for this row follow until the next spec; replace them
    ei = si + 1  # data lines can be 80 chars wide: a real marker has alphas
    while ei < len(lines) and not any(c.isalpha() for c in lines[ei][60:]):
        ei += 1
    new = lines[:si] + [f"{spec:<60}LAT/LON1/LON2/DLON/H",
                        "".join(f"{v:5}" for v in (11, 22, 33))] + lines[ei:]
    _, _, tec2, _ = parse_ionex("\n".join(new) + "\n")
    assert tec2[0, 0, 4] == 11
    assert tec2[0, 0, 6] == 22
    assert tec2[0, 0, 8] == 33
    assert tec2[0, 0, 5] == 9999  # skipped by the row's stride


def test_per_row_lon_spec_misaligned_raises():
    hdr = make_header(1)
    epochs, dense = make_grids(1)
    g = hdr.grid
    lines = write_ionex(hdr, epochs, dense).splitlines()
    si = [i for i, l in enumerate(lines) if "LAT/LON1/LON2/DLON/H" in l][0]
    lat_v = float(lines[si][2:8])
    # lon1 off the header grid by half a spacing -> must raise, not misplace
    lon1 = g.lon.start + 0.5 * g.lon.spacing
    spec = (
        f"  {lat_v:6.1f}{lon1:6.1f}{g.lon.end:6.1f}"
        f"{g.lon.spacing:6.1f}{g.alt.start:6.1f}"
    )
    lines[si] = f"{spec:<60}LAT/LON1/LON2/DLON/H"
    with pytest.raises(ValueError, match="lon spec"):
        parse_ionex("\n".join(lines) + "\n")


def test_version_and_refsystem_roundtrip():
    """VERSION / TYPE line: version via Version.parse, trailing reference
    system token parsed and re-emitted (src/version.rs, src/system.rs)."""
    hdr = make_header(1)
    hdr.reference_system = "GPS"
    hdr.mapping_function = "cosine"  # alias normalizes to COSZ on write-parse
    epochs, dense = make_grids(1)
    h2, _, _, _ = parse_ionex(write_ionex(hdr, epochs, dense))
    assert h2.version == (1, 0)
    assert h2.reference_system == "GPS"
    assert h2.mapping_function == "COSZ"


def test_testpoint_vector_against_field():
    """End-to-end TestPoint pattern (src/tests/toolkit.rs:53-131): write the
    smooth field, parse it back, bilinear-interpolate >= 18 probe points and
    compare against the oracle field evaluated on the re-quantized corners."""
    n_epochs = 3
    hdr = make_header(n_epochs)
    epochs, dense = make_grids(n_epochs, field="smooth")
    text = write_ionex(hdr, epochs, dense)
    _, ep2, tec2, _ = parse_ionex(text)
    np.testing.assert_array_equal(tec2, dense)

    # probe points spanning corners, dateline, both hemispheres, 3 epochs
    probes = [
        (-87.5, -180.0, 0), (87.5, 180.0, 0), (0.3, 0.3, 0),
        (-30.2, 100.7, 0), (45.1, -120.4, 0), (87.3, 179.9, 0),
        (-87.3, -179.9, 1), (10.0, 10.0, 1), (-10.0, -10.0, 1),
        (60.0, 60.0, 1), (-60.0, -60.0, 1), (33.3, -77.7, 1),
        (1.2, 179.0, 2), (-1.2, -179.0, 2), (80.0, 0.0, 2),
        (-80.0, 0.0, 2), (25.4, 55.5, 2), (-25.4, -55.5, 2),
    ]
    for lat, lon, slot in probes:
        li = int(np.floor((lat - synth.GRID_LAT0) / synth.GRID_DLAT))
        li = min(li, synth.GRID_NLAT - 2)
        lo = int(np.floor((lon - synth.GRID_LON0) / synth.GRID_DLON))
        lo = min(lo, synth.GRID_NLON - 2)
        lat_sw = synth.GRID_LAT0 + li * synth.GRID_DLAT
        lon_sw = synth.GRID_LON0 + lo * synth.GRID_DLON
        # dense row 0 = north; convert ascending index -> dense row
        row = lambda i: synth.GRID_NLAT - 1 - i
        sw = tec2[slot, row(li), lo] / 10.0
        se = tec2[slot, row(li), lo + 1] / 10.0
        nw = tec2[slot, row(li + 1), lo] / 10.0
        ne = tec2[slot, row(li + 1), lo + 1] / 10.0
        got = bilinear(
            lon, lat, lon_sw, lat_sw, synth.GRID_DLON, synth.GRID_DLAT,
            sw, se, nw, ne,
        )
        # oracle: same bilinear on the same quantized corners (abs < 1e-5,
        # the reference's tolerance src/tests/toolkit.rs:116)
        p = (lat - lat_sw) / synth.GRID_DLAT
        q = (lon - lon_sw) / synth.GRID_DLON
        want = (
            (1 - p) * (1 - q) * sw + p * (1 - q) * se
            + q * (1 - p) * nw + p * q * ne
        )
        assert got == pytest.approx(want, abs=1e-5)


def test_mid_file_exponent_update():
    """Legal in-record EXPONENT change: earlier maps keep their exponent,
    later maps pick up the new one (src/record/parsing.rs:72-84)."""
    hdr = make_header(2)
    epochs, dense = make_grids(2)
    lines = write_ionex(hdr, epochs, dense).splitlines()
    idx = [i for i, l in enumerate(lines) if "START OF TEC MAP" in l][1]
    lines.insert(idx, f"{'    -2':<60}EXPONENT")
    h2, ep2, tec2, _ = parse_ionex("\n".join(lines) + "\n")
    assert h2.exp_per_map == [-1, -2]
    np.testing.assert_array_equal(tec2, dense)  # quantized values untouched


def test_height_map_parsing():
    """HEIGHT maps parse into header.height_q — beyond reference parity
    (the reference leaves them TODO, src/record/parsing.rs:174-175)."""
    from ionex_spark.core.ionex_io import _fmt_epoch_body
    from ionex_spark.core.linspace import ckmg_grid

    hdr = make_header(1)
    epochs, dense = make_grids(1)
    lines = write_ionex(hdr, epochs, dense).splitlines()
    eof = lines.pop()
    g = ckmg_grid()
    lats = g.lat.values()
    h = np.full(dense.shape[1:], 4500, np.int64)
    lines += _fmt_line(f"{1:6}", "START OF HEIGHT MAP")
    lines += _fmt_line(_fmt_epoch_body(epochs[0]), "EPOCH OF CURRENT MAP")
    for r in range(h.shape[0]):
        spec = (
            f"  {lats[r]:6.1f}{g.lon.start:6.1f}{g.lon.end:6.1f}"
            f"{g.lon.spacing:6.1f}{g.alt.start:6.1f}"
        )
        lines.append(f"{spec:<60}LAT/LON1/LON2/DLON/H")
        row = h[r]
        for off in range(0, len(row), 16):
            lines.append("".join(f"{int(v):5}" for v in row[off:off + 16]))
    lines += _fmt_line(f"{1:6}", "END OF HEIGHT MAP")
    lines.append(eof)
    h2, _, tec2, _ = parse_ionex("\n".join(lines) + "\n")
    assert h2.height_q is not None and h2.height_q.shape == (1, 71, 73)
    np.testing.assert_array_equal(h2.height_q[0], h)
    np.testing.assert_array_equal(tec2, dense)


def test_corrupt_data_item_keeps_positions():
    """An unparseable data item becomes the 9999 sentinel; values after
    it stay in their true longitude columns (no west-shift)."""
    hdr = make_header(1)
    epochs, dense = make_grids(1)
    lines = write_ionex(hdr, epochs, dense).splitlines()
    # corrupt the SECOND 5-char item of the first data line
    si = [i for i, l in enumerate(lines) if "LAT/LON1/LON2/DLON/H" in l][0]
    d = lines[si + 1]
    lines[si + 1] = d[:5] + "   XX" + d[10:]
    _, _, tec2, _ = parse_ionex("\n".join(lines) + "\n")
    assert tec2[0, 0, 1] == 9999  # corrupt -> sentinel
    np.testing.assert_array_equal(tec2[0, 0, 2:], dense[0, 0, 2:])  # no shift
    assert tec2[0, 0, 0] == dense[0, 0, 0]


def test_simhash_pairs_rejects_wide_threshold():
    from ionex_spark.operators import dedup as dd2

    with pytest.raises(ValueError, match="max_hamming"):
        dd2.simhash_near_dup_pairs(None, max_hamming=4)
