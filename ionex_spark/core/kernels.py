"""The two interpolation kernels — numpy oracle implementations.

Bilinear spatial interpolation (reference src/cell/mod.rs:412-432):

    p = (y - y_sw) / lat_span        # latitude fraction
    q = (x - x_sw) / lon_span        # longitude fraction
    E = (1-p)(1-q)*E_sw + p(1-q)*E_se + q(1-p)*E_nw + p*q*E_ne

We reproduce the reference's EXACT coefficient assignment — the latitude
fraction ``p`` multiplies the *SE* corner and the longitude fraction ``q``
multiplies the *NW* corner (src/cell/mod.rs:421-429; axes swapped relative
to corner names — see SURVEY.md §2.8).  On the reference's unit-cell golden
fixtures (src/cell/mod.rs:833-909) this is indistinguishable from the
IONEX-spec orientation, and those fixtures are the contract:

    corners (sw,se,nw,ne)=(1,1,1,1), point (0.5,0.5) -> 1.0
    corners (1,0,0,0): (0.5,0.5)->0.25  (0.1,0.1)->0.81
                       (0.01,0.01)->0.9801  (0,0)->1.0

Unlike the reference (which divides by the span without subtracting the
SW origin — observable only off the origin-anchored fixtures, documented
in SURVEY.md §2.8), we anchor at the SW corner per the IONEX spec.

Temporal (epoch-bracketed) interpolation (src/cell/mod.rs:799-830):

    tec(t) = ((t1-t)/dt)*tec(t0) + ((t-t0)/dt)*tec(t1),  dt = t1-t0

valid for t0 <= t <= t1; golden: const-1.0 maps at t0, t0+30s -> t0+15s
= 1.0; t outside the bracket is an error/NULL (src/cell/mod.rs:911-961).
"""

from __future__ import annotations

import numpy as np


def bilinear_unit(p, q, e_sw, e_se, e_nw, e_ne):
    """Bilinear combine on unit fractions p (lat), q (lon) in [0, 1]."""
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    return (
        (1.0 - p) * (1.0 - q) * np.asarray(e_sw, dtype=np.float64)
        + p * (1.0 - q) * np.asarray(e_se, dtype=np.float64)
        + q * (1.0 - p) * np.asarray(e_nw, dtype=np.float64)
        + p * q * np.asarray(e_ne, dtype=np.float64)
    )


def bilinear(x, y, x_sw, y_sw, lon_span, lat_span, e_sw, e_se, e_nw, e_ne,
             out_of_bounds="nan"):
    """Bilinear interpolation of a point (x=lon, y=lat) inside a cell.

    Containment pre-check mirrors src/cell/mod.rs:413-415: points outside
    the cell produce NaN (the engine's NULL) instead of an error.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    p = (y - np.asarray(y_sw, dtype=np.float64)) / np.asarray(lat_span, np.float64)
    q = (x - np.asarray(x_sw, dtype=np.float64)) / np.asarray(lon_span, np.float64)
    val = bilinear_unit(p, q, e_sw, e_se, e_nw, e_ne)
    if out_of_bounds == "nan":
        inside = (p >= 0.0) & (p <= 1.0) & (q >= 0.0) & (q <= 1.0)
        val = np.where(inside, val, np.nan)
    return val


def temporal_weights(t, t0, t1):
    """(w0, w1) linear weights for t in [t0, t1]; NaN outside the bracket.

    t, t0, t1 are numeric (e.g. epoch seconds).  Mirrors the bracket
    validity check at src/cell/mod.rs:811,819 (both orientations), with
    out-of-bracket -> NaN instead of TemporalMismatch.
    """
    t = np.asarray(t, dtype=np.float64)
    t0 = np.asarray(t0, dtype=np.float64)
    t1 = np.asarray(t1, dtype=np.float64)
    dt = t1 - t0
    w1 = (t - t0) / dt
    inside = (w1 >= 0.0) & (w1 <= 1.0)
    w1 = np.where(inside, w1, np.nan)
    return 1.0 - w1, w1


def temporal_interp(t, t0, t1, v0, v1):
    """Linear combine of values at the bracket epochs."""
    w0, w1 = temporal_weights(t, t0, t1)
    return w0 * np.asarray(v0, np.float64) + w1 * np.asarray(v1, np.float64)
