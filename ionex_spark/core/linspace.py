"""Quantized linear spaces and the lat/lon/alt grid.

Mirrors the reference's ``Linspace`` (/root/reference/src/linspace.rs:36-45)
and ``Grid`` (/root/reference/src/grid.rs:29-38): a (start, end, spacing)
triple held as integer-quantized values with a shared per-axis exponent.

Golden semantics (src/linspace.rs:192-310):
- length of (1, 180, 1) is 180; a single-point space (350, 350, 0) has
  length 1.  DOCUMENTED DEVIATION: the reference's ``length()`` is
  ``floor(end / spacing)`` ignoring ``start`` (src/linspace.rs:153-155),
  which returns 360 for (1, 180, 0.5) and a nonsensical 35 for the
  lat axis (87.5, -87.5, -2.5); this engine computes the true inclusive
  point count ((end-start)/spacing + 1 = 359 and 71 respectively), which
  is what the reference's own parser effectively produces when walking
  the grid (71 lat rows in the CKMG e2e tests, src/tests/v1.rs:211-223).
- ``nearest_lower``: greatest grid line <= x (lat grid (-87.5, 87.5, 2.5)
  at -85.0 -> -85.0; lon grid (-180, 180, 5) at -179 -> -180).
- spacing may be negative (IONEX lat axes run north->south,
  src/record/formatting.rs:49-51).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ionex_spark.core.quantized import find_exponent, quantize, real_value


@dataclass(frozen=True)
class Linspace:
    """Inclusive linear space start..end stepped by spacing (may be negative)."""

    start: float
    end: float
    spacing: float

    @property
    def exponent(self) -> int:
        return max(
            find_exponent(self.start),
            find_exponent(self.end),
            find_exponent(self.spacing),
        )

    def __len__(self) -> int:
        if self.spacing == 0.0:
            return 1
        # integer arithmetic on quantized values avoids float length errors
        e = self.exponent
        span = int(quantize(self.end, e)) - int(quantize(self.start, e))
        step = int(quantize(self.spacing, e))
        return abs(span) // abs(step) + 1

    def values(self) -> np.ndarray:
        """All grid line values, start -> end inclusive, float64."""
        n = len(self)
        e = self.exponent
        q0 = quantize(self.start, e)
        dq = quantize(self.spacing, e) if self.spacing else 0
        return real_value(q0 + dq * np.arange(n, dtype=np.int64), e)

    def ascending(self) -> "Linspace":
        if self.spacing < 0:
            return Linspace(self.end, self.start, -self.spacing)
        return self

    def nearest_lower(self, x) -> np.ndarray:
        """Greatest grid line <= x (NaN where x < min); vectorized."""
        asc = self.ascending()
        x = np.asarray(x, dtype=np.float64)
        if asc.spacing == 0.0:  # single-point axis (e.g. alt 350..350)
            out = np.where(x >= asc.start, asc.start, np.nan)
            return out if out.shape else float(out)
        idx = np.floor((x - asc.start) / asc.spacing).astype(np.int64)
        idx = np.minimum(idx, len(asc) - 1)
        out = asc.start + idx * asc.spacing
        out = np.where(idx < 0, np.nan, out)
        return out if out.shape else float(out)

    def nearest_above(self, x) -> np.ndarray:
        """Smallest grid line >= x (NaN where x > max); vectorized."""
        asc = self.ascending()
        x = np.asarray(x, dtype=np.float64)
        if asc.spacing == 0.0:
            out = np.where(x <= asc.end, asc.end, np.nan)
            return out if out.shape else float(out)
        idx = np.ceil((x - asc.start) / asc.spacing).astype(np.int64)
        idx = np.maximum(idx, 0)
        out = asc.start + idx * asc.spacing
        out = np.where(idx > len(asc) - 1, np.nan, out)
        return out if out.shape else float(out)

    def stretched(self, factor: float) -> "Linspace":
        """Scale the dims (start/end), keep spacing (src/linspace.rs:77-96)."""
        return Linspace(self.start * factor, self.end * factor, self.spacing)

    def resampled(self, factor: float) -> "Linspace":
        """Scale the spacing, keep dims (src/linspace.rs:98-116)."""
        return Linspace(self.start, self.end, self.spacing * factor)


@dataclass(frozen=True)
class Grid:
    """lat/lon/alt linspace triple (reference src/grid.rs:29-38)."""

    lat: Linspace
    lon: Linspace
    alt: Linspace

    WORLDWIDE_LAT = (-87.5, 87.5)
    WORLDWIDE_LON = (-180.0, 180.0)

    def is_worldwide(self) -> bool:
        """Bounds equality test (reference src/grid.rs:53-61)."""
        a = self.lat.ascending()
        o = self.lon.ascending()
        return (a.start, a.end) == self.WORLDWIDE_LAT and (
            o.start,
            o.end,
        ) == self.WORLDWIDE_LON

    def cell_counts(self) -> tuple[int, int]:
        return len(self.lat) - 1, len(self.lon) - 1


def ckmg_grid() -> Grid:
    """The worldwide grid of the reference's benchmark file CKMG0020.22I
    (25 epochs x 71 lat x 73 lon, /root/reference/src/tests/v1.rs:211-223):
    lat 87.5 -> -87.5 step -2.5, lon -180 -> 180 step 5, alt 350 fixed."""
    return Grid(
        lat=Linspace(87.5, -87.5, -2.5),
        lon=Linspace(-180.0, 180.0, 5.0),
        alt=Linspace(350.0, 350.0, 0.0),
    )
