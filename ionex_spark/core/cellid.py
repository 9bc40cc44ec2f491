"""Hierarchical int64 lat/lon cell encoding (H3/S2-style interface).

Generalizes the reference's quantized grid-cell lookup
(/root/reference/src/linspace.rs:163-179, src/lib.rs:1139-1143) into a
hierarchical global cell index, per BASELINE.json.north_rule.

Scheme (chosen to be expressible as plain SQL arithmetic so Catalyst keeps
it JVM-side and the DuckDB oracle can reproduce it bit-for-bit):

- resolution r in [0, 27]; at res r the globe is a 2^r x 2^(r+1) grid
  (nlat rows x nlon cols), cell edge = 180/2^r degrees.
- lat_idx = clamp(floor((lat + 90) / edge), 0, nlat-1)
- lon is wrapped to [-180, 180): lon_n = lon - 360*floor((lon+180)/360);
  lon_idx = clamp(floor((lon_n + 180) / edge), 0, nlon-1)
- cell_id = (r << 58) | (lat_idx << 29) | lon_idx   (all fields disjoint)

``cell_parent`` truncates indices (>> (r - r')); ``cell_ring`` enumerates
the Chebyshev-k neighborhood with longitude wrap-around and latitude clamp
at the poles — the engine's kNN candidate generator (SURVEY.md §2.3).
"""

from __future__ import annotations

import numpy as np

MAX_RES = 27
_RES_SHIFT = 58
_LAT_SHIFT = 29
_IDX_MASK = (1 << 29) - 1


def _dims(res: int) -> tuple[int, int, float]:
    nlat = 1 << res
    nlon = 1 << (res + 1)
    edge = 180.0 / nlat
    return nlat, nlon, edge


def cell_encode(lat, lon, res: int):
    """Encode lat/lon (degrees) to an int64 cell id at resolution ``res``."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution must be in [0, {MAX_RES}]")
    nlat, nlon, edge = _dims(res)
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    lon_n = lon - 360.0 * np.floor((lon + 180.0) / 360.0)
    lat_idx = np.clip(np.floor((lat + 90.0) / edge), 0, nlat - 1).astype(np.int64)
    lon_idx = np.clip(np.floor((lon_n + 180.0) / edge), 0, nlon - 1).astype(np.int64)
    out = (
        (np.int64(res) << _RES_SHIFT) | (lat_idx << _LAT_SHIFT) | lon_idx
    )
    return out if out.shape else np.int64(out)


def cell_decode(cell_id):
    """cell_id -> (res, lat_idx, lon_idx); vectorized."""
    c = np.asarray(cell_id, dtype=np.int64)
    res = (c >> _RES_SHIFT).astype(np.int64)
    lat_idx = (c >> _LAT_SHIFT) & _IDX_MASK
    lon_idx = c & _IDX_MASK
    return res, lat_idx, lon_idx


def cell_to_latlon(cell_id):
    """Cell center (lat, lon) in degrees; vectorized."""
    res, lat_idx, lon_idx = cell_decode(cell_id)
    edge = 180.0 / (np.int64(1) << res).astype(np.float64)
    lat = -90.0 + (lat_idx.astype(np.float64) + 0.5) * edge
    lon = -180.0 + (lon_idx.astype(np.float64) + 0.5) * edge
    return lat, lon


def cell_parent(cell_id, parent_res: int):
    """Ancestor cell at a coarser resolution; vectorized."""
    res, lat_idx, lon_idx = cell_decode(cell_id)
    shift = res - parent_res
    if np.any(shift < 0):
        raise ValueError("parent_res must be <= cell resolution")
    out = (
        (np.int64(parent_res) << _RES_SHIFT)
        | ((lat_idx >> shift) << _LAT_SHIFT)
        | (lon_idx >> shift)
    )
    return out if np.asarray(cell_id).shape else np.int64(out)


def cell_ring(cell_id: int, k: int = 1) -> np.ndarray:
    """All cells within Chebyshev distance k (incl. self): lon wraps,
    lat rows beyond the poles are dropped.  Scalar cell in, int64 array out."""
    res, lat_idx, lon_idx = cell_decode(np.int64(cell_id))
    res, lat_idx, lon_idx = int(res), int(lat_idx), int(lon_idx)
    nlat, nlon, _ = _dims(res)
    cells = []
    for dlat in range(-k, k + 1):
        li = lat_idx + dlat
        if li < 0 or li >= nlat:
            continue
        for dlon in range(-k, k + 1):
            lo = (lon_idx + dlon) % nlon
            cells.append((res << _RES_SHIFT) | (li << _LAT_SHIFT) | lo)
    return np.array(sorted(set(cells)), dtype=np.int64)
