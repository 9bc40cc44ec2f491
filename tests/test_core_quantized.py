"""Golden fixtures from /root/reference/src/quantized.rs:73-118 (FIXTURES.md §2.3)."""

import numpy as np
import pytest

from ionex_spark.core import find_exponent, quantize, real_value


@pytest.mark.parametrize(
    "value,expected",
    [(5.0, 0), (5.5, 1), (0.5, 1), (1.25, 2), (0.25, 2), (0.333, 3)],
)
def test_find_exponent(value, expected):
    assert find_exponent(value) == expected


@pytest.mark.parametrize(
    "value,exp",
    [(1.0, 0), (1.0, 1), (1.1, 1), (1.25, 2), (1.333, 3), (-3.215, 3)],
)
def test_round_trip(value, exp):
    assert real_value(quantize(value, exp), exp) == value


def test_ordering_cross_exponent():
    # 1.12@3 > 1.1@1 ; -1.0@1 < 0.0@1 (on real values)
    assert real_value(quantize(1.12, 3), 3) > real_value(quantize(1.1, 1), 1)
    assert real_value(quantize(-1.0, 1), 1) < real_value(quantize(0.0, 1), 1)


def test_half_away_from_zero():
    # Rust f64::round semantics, NOT banker's rounding
    assert quantize(0.5, 0) == 1
    assert quantize(1.5, 0) == 2
    assert quantize(2.5, 0) == 3
    assert quantize(-0.5, 0) == -1
    assert quantize(-2.5, 0) == -3


def test_vectorized():
    q = quantize(np.array([1.25, -3.215]), 3)
    assert q.dtype == np.int64
    np.testing.assert_array_equal(q, [1250, -3215])


def test_tec_scaling():
    # TEC::from_quantized(30,-1)->3.0 TECu; (30,-2)->0.3 (src/tec.rs:100-110)
    assert real_value(30, 1) == 3.0  # stored exponent -1 => real = q*10^-1
    assert real_value(30, 2) == pytest.approx(0.3)
    # tec() = tecu * 10.0E16 = 1e17 quirk (src/tec.rs:126-128,144-152)
    assert 3.0 * 10.0e16 == 3.0e17
