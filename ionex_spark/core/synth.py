"""Deterministic synthetic data — images table, TEC grid field, polygons.

Everything is seeded and reproducible with NO external data (FIXTURES.md §1).
Two TEC field flavours:

- ``tecu_q_int`` — an integer-arithmetic field, expressible identically in
  Spark SQL and DuckDB SQL (the driver's oracle gate needs bit-equal floats,
  so no transcendentals):  tecu_q = ((lat_i*31 + lon_i*17 + slot*13) % 500)
  + 10, exponent -1  (lat_i ascending from -87.5, lon_i from -180).
- ``tecu_smooth`` — a smooth cos-based field used for IONEX round-trip and
  interpolation-accuracy tests against the numpy oracle (FIXTURES.md §1.2).

Grid = the reference benchmark file's worldwide grid (CKMG0020.22I:
25 hourly epochs x 71 lat x 73 lon, /root/reference/src/tests/v1.rs:211-223).
"""

from __future__ import annotations

import numpy as np

from ionex_spark.core.codec import encode_image, phash64

# ------------------------------------------------------- deterministic PRNG

_U64 = np.uint64


def splitmix64(x) -> np.ndarray:
    """SplitMix64 of the input index/indices — the engine's seeded stream."""
    with np.errstate(over="ignore"):  # uint64 wraparound is the algorithm
        z = np.asarray(x).astype(np.uint64) + _U64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        return z ^ (z >> _U64(31))


def u01(x, stream: int = 0) -> np.ndarray:
    """Uniform [0,1) doubles from index + stream id."""
    h = splitmix64(np.asarray(x).astype(np.uint64) * _U64(1000003) + _U64(stream))
    return (h >> _U64(11)).astype(np.float64) / float(1 << 53)


# ----------------------------------------------------------- TEC grid field

GRID_LAT0, GRID_DLAT, GRID_NLAT = -87.5, 2.5, 71
GRID_LON0, GRID_DLON, GRID_NLON = -180.0, 5.0, 73
GRID_ALT = 350.0
EPOCH0 = np.datetime64("2022-01-02T00:00:00")
SAMPLING_S = 3600
N_EPOCHS = 25
FILE_EXP = -1  # 0.1 TECu resolution (reference default, src/header/mod.rs:95)


def tecu_q_int(lat_i, lon_i, slot):
    """Integer TEC field (quantized, exponent -1). SQL-portable."""
    lat_i = np.asarray(lat_i, dtype=np.int64)
    lon_i = np.asarray(lon_i, dtype=np.int64)
    slot = np.asarray(slot, dtype=np.int64)
    return (lat_i * 31 + lon_i * 17 + slot * 13) % 500 + 10


def tecu_smooth(lat_deg, lon_deg, t_sec):
    """Smooth field a + b*cos(lat)*cos(2pi*(lon/360 + t/86400)), TECu."""
    lat = np.asarray(lat_deg, dtype=np.float64)
    lon = np.asarray(lon_deg, dtype=np.float64)
    t = np.asarray(t_sec, dtype=np.float64)
    return 25.0 + 20.0 * np.cos(np.radians(lat)) * np.cos(
        2.0 * np.pi * (lon / 360.0 + t / 86400.0)
    )


def tec_points_arrays(n_epochs: int = N_EPOCHS, field: str = "int"):
    """Dense grid as flat arrays: (slot, lat_i, lon_i, lat, lon, tecu_q).

    lat_i ascends from GRID_LAT0 (south), lon_i from GRID_LON0 (west).
    """
    slot, lat_i, lon_i = np.meshgrid(
        np.arange(n_epochs, dtype=np.int64),
        np.arange(GRID_NLAT, dtype=np.int64),
        np.arange(GRID_NLON, dtype=np.int64),
        indexing="ij",
    )
    slot, lat_i, lon_i = slot.ravel(), lat_i.ravel(), lon_i.ravel()
    lat = GRID_LAT0 + lat_i * GRID_DLAT
    lon = GRID_LON0 + lon_i * GRID_DLON
    if field == "int":
        tecu_q = tecu_q_int(lat_i, lon_i, slot)
    else:
        t = slot.astype(np.float64) * SAMPLING_S
        tecu_q = np.round(tecu_smooth(lat, lon, t) * 10.0).astype(np.int64)
    return slot, lat_i, lon_i, lat, lon, tecu_q


# -------------------------------------------------------------- images table

_WORDS = (
    "aurora basalt cirrus delta ember fjord glacier harbor isthmus jetty "
    "krill lagoon mesa nadir oasis plateau quartz ridge summit tundra"
).split()

SIZES = (16, 32, 64)
HOT_CELL_FRACTION = 0.2  # Zipfian share of rows planted into 3 hot cells
HOT_CELLS = ((12.5, 17.5), (47.5, -122.5), (-33.5, 151.5))  # (lat, lon)


def caption_of(i: int) -> str:
    """Just the deterministic caption for row i — image_row minus the
    pixel/phash work (0.6 ms/row regenerated pixels only to compare a
    string; the verify path calls this per sampled row)."""
    cap_words = [_WORDS[int(x)] for x in splitmix64(np.arange(3) + i * 7) % 20]
    return f"caption of image {i}: " + " ".join(cap_words)


def image_row(i: int, with_bytes: bool = True) -> dict:
    """One deterministic row of the `images` table (input_hint schema +
    derived query columns lat/lon/ts). Keyed only by the row index."""
    w = SIZES[i % 3]
    h = SIZES[(i // 3) % 3]
    fmt = "ppm" if i % 2 == 0 else "dct"
    caption = caption_of(i)
    row = {
        "image_id": f"img{i:012d}",
        "w": np.int32(w),
        "h": np.int32(h),
        "fmt": fmt,
        "caption": caption,
    }
    pixels = image_pixels(i, w, h)
    row["phash"] = np.int64(phash64(pixels))
    if with_bytes:
        row["bytes"] = encode_image(pixels, fmt)
    # derived query columns
    r_lat, r_lon, r_ts, r_hot, r_which = (
        u01(i, 1), u01(i, 2), u01(i, 3), u01(i, 4), u01(i, 5),
    )
    if r_hot < HOT_CELL_FRACTION:  # planted skew (SURVEY.md §4.2 salting)
        hc = HOT_CELLS[int(r_which * 3) % 3]
        row["lat"] = hc[0] + (r_lat - 0.5) * 0.5
        row["lon"] = hc[1] + (r_lon - 0.5) * 0.5
    else:
        row["lat"] = -87.5 + r_lat * 175.0
        row["lon"] = -180.0 + r_lon * 360.0
    row["ts"] = EPOCH0 + np.timedelta64(
        int(r_ts * (N_EPOCHS - 1) * SAMPLING_S), "s"
    )
    return row


def image_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic smooth-ish pixel field for row i (uint8 HxWx3)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = splitmix64(np.arange(3) + i * 13) % 200
    img = np.empty((h, w, 3), dtype=np.uint8)
    for c in range(3):
        plane = (
            float(base[c])
            + 40.0 * np.sin(2 * np.pi * (xx / w + c / 3.0 + (i % 7) / 7.0))
            + 40.0 * np.cos(2 * np.pi * (yy / h + (i % 5) / 5.0))
        )
        img[:, :, c] = np.clip(np.round(plane), 0, 255).astype(np.uint8)
    return img


# ----------------------------------------------------------------- polygons

def polygon_rings() -> list[dict]:
    """Deterministic PIP operands: convex, concave, and dateline-adjacent
    rings (FIXTURES.md §1.4). Rings are closed (first == last) CCW."""
    rect = [(-30.0, -30.0), (30.0, -30.0), (30.0, 30.0), (-30.0, 30.0),
            (-30.0, -30.0)]  # the reference ROI rect (src/tests/roi.rs:25-36)
    concave = [(0.0, 0.0), (40.0, 0.0), (40.0, 40.0), (20.0, 10.0),
               (0.0, 40.0), (0.0, 0.0)]
    dateline = [(150.0, -20.0), (179.5, -20.0), (179.5, 20.0), (150.0, 20.0),
                (150.0, -20.0)]
    # TRUE dateline-crossing ring (170E..170W): stored in SHIFTED
    # longitudes (range 170..190); consumers shift western-hemisphere
    # points by +360 before testing (pip.edges_df handles it)
    crossing = [(170.0, -15.0), (190.0, -15.0), (190.0, 15.0),
                (170.0, 15.0), (170.0, -15.0)]
    return [
        {"poly_id": "roi_rect", "ring": rect},
        {"poly_id": "concave", "ring": concave},
        {"poly_id": "dateline", "ring": dateline},
        {"poly_id": "dateline_x", "ring": crossing, "lon_shifted": True},
    ]
