"""Decimal quantization: real value <-> (int64 value, exponent).

Mirrors the reference's ``Quantized`` type semantics
(/root/reference/src/quantized.rs:13-19,43-58,68-70):

- ``quantize(v, e)``  = round(v * 10**e) as int64, rounding half AWAY from
  zero (Rust ``f64::round``), NOT banker's rounding.
- ``real_value(q, e)`` = q / 10**e.
- ``find_exponent(v)`` = smallest e >= 0 such that ``(v * 10**e)`` has zero
  fractional part under f64 arithmetic.  The reference implements this as a
  float loop; we reproduce the same IEEE-754 operations so the results agree
  bit-for-bit (golden values: 5.0->0, 5.5->1, 0.5->1, 1.25->2, 0.25->2,
  0.333->3 — /root/reference/src/quantized.rs:73-118).

In the engine, per-column exponents are FIXED per axis (derived from the
grid spacing, as the reference's record parser does at
src/record/parsing.rs:48-49,226-227); ``find_exponent`` exists only for
API parity and for deriving those axis constants.
"""

from __future__ import annotations

import numpy as np

_MAX_EXP = 12  # sanity bound for the float loop


def quantize(values, exponent: int):
    """Integer-scale ``values`` by 10**exponent, rounding half away from zero.

    Works on scalars and numpy arrays; returns int64.
    """
    v = np.asarray(values, dtype=np.float64)
    scaled = v * (10.0 ** exponent)
    # round half away from zero (Rust f64::round), not np.rint (half-even)
    out = np.copysign(np.floor(np.abs(scaled) + 0.5), scaled)
    return out.astype(np.int64) if out.shape else np.int64(out)


def real_value(quantized, exponent: int):
    """Inverse of :func:`quantize`: q / 10**exponent as float64."""
    q = np.asarray(quantized, dtype=np.float64)
    out = q / (10.0 ** exponent)
    return out if out.shape else float(out)


def find_exponent(value: float) -> int:
    """Smallest e >= 0 with fract(value * 10**e) == 0.0 under f64 math."""
    v = float(value)
    e = 0
    while e < _MAX_EXP:
        scaled = v * (10.0 ** e)
        if scaled == np.trunc(scaled):  # Rust fract() is trunc-based
            return e
        e += 1
    return e
