"""Property-based tests (hypothesis) for the numpy core kernels."""

import numpy as np
from hypothesis import given, settings, strategies as st

from ionex_spark.core import (
    bilinear,
    bilinear_unit,
    cell_decode,
    cell_encode,
    cell_parent,
    quantize,
    real_value,
    temporal_weights,
)

lat_st = st.floats(-90.0, 90.0, allow_nan=False)
lon_st = st.floats(-1000.0, 1000.0, allow_nan=False)
frac_st = st.floats(0.0, 1.0, allow_nan=False)
tec_st = st.floats(-500.0, 500.0, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(st.floats(-1e6, 1e6, allow_nan=False), st.integers(0, 4))
def test_quantize_roundtrip_within_half_ulp(v, e):
    # |real(quantize(v)) - v| <= 0.5 * 10^-e (quantization step)
    q = quantize(v, e)
    assert abs(real_value(q, e) - v) <= 0.5 * 10.0 ** (-e) + 1e-9


@settings(max_examples=200, deadline=None)
@given(frac_st, frac_st, tec_st, tec_st, tec_st, tec_st)
def test_bilinear_convex_combination(p, q, sw, se, nw, ne):
    # inside the cell the result is a convex combination of the corners
    v = bilinear_unit(p, q, sw, se, nw, ne)
    lo, hi = min(sw, se, nw, ne), max(sw, se, nw, ne)
    assert lo - 1e-9 <= v <= hi + 1e-9


@settings(max_examples=100, deadline=None)
@given(frac_st, frac_st, tec_st)
def test_bilinear_constant_field_exact(p, q, c):
    assert bilinear_unit(p, q, c, c, c, c) == np.float64(
        (1 - p) * (1 - q) * c + p * (1 - q) * c + q * (1 - p) * c + p * q * c
    )


@settings(max_examples=100, deadline=None)
@given(tec_st, tec_st, tec_st, tec_st)
def test_bilinear_corner_exactness(sw, se, nw, ne):
    # p/q in {0,1} return the corners under the reference's pairing:
    # p weights SE, q weights NW (src/cell/mod.rs:421-429)
    assert bilinear_unit(0.0, 0.0, sw, se, nw, ne) == sw
    assert bilinear_unit(1.0, 0.0, sw, se, nw, ne) == se
    assert bilinear_unit(0.0, 1.0, sw, se, nw, ne) == nw
    assert bilinear_unit(1.0, 1.0, sw, se, nw, ne) == ne


@settings(max_examples=200, deadline=None)
@given(st.floats(0.0, 86399.0, allow_nan=False))
def test_temporal_weights_partition_of_unity(t):
    t0 = np.floor(t / 3600.0) * 3600.0
    w0, w1 = temporal_weights(t, t0, t0 + 3600.0)
    assert 0.0 <= w1 <= 1.0
    assert w0 + w1 == 1.0


@settings(max_examples=300, deadline=None)
@given(lat_st, lon_st, st.integers(0, 27))
def test_cell_encode_decode_consistent(lat, lon, res):
    c = cell_encode(lat, lon, res)
    r, li, lo = cell_decode(c)
    assert r == res
    assert 0 <= li < (1 << res)
    assert 0 <= lo < (1 << (res + 1))


@settings(max_examples=200, deadline=None)
@given(lat_st, lon_st, st.integers(1, 27))
def test_parent_is_encode_at_parent_res(lat, lon, res):
    parent_res = res - 1
    assert cell_parent(cell_encode(lat, lon, res), parent_res) == cell_encode(
        lat, lon, parent_res
    )


@settings(max_examples=200, deadline=None)
@given(lat_st, st.floats(-180.0, 180.0, exclude_max=True), st.integers(0, 20))
def test_lon_wrap_invariance(lat, lon, res):
    # adding/subtracting 360 loses low bits, so a point within an ulp of a
    # cell boundary can legitimately land one cell over — exclude those
    # (the documented wrap semantics are about geometry, not ulp edges)
    from hypothesis import assume

    edge = 180.0 / (1 << res)
    frac = abs((lon + 180.0) / edge - round((lon + 180.0) / edge))
    assume(frac * edge > 1e-7)
    assert cell_encode(lat, lon, res) == cell_encode(lat, lon + 360.0, res)
    assert cell_encode(lat, lon, res) == cell_encode(lat, lon - 720.0, res)


@settings(max_examples=100, deadline=None)
@given(
    st.floats(-87.4, 87.4, allow_nan=False),
    st.floats(-179.9, 179.9, allow_nan=False),
)
def test_bilinear_outside_cell_nan(lat, lon):
    # a point strictly outside the queried cell must yield NaN
    v = bilinear(lon + 10.0, lat, lon, lat - 1.0, 5.0, 2.5, 1, 2, 3, 4)
    assert np.isnan(v)


# ------------------------------------------ IONEX ASCII round-trip fuzz

@settings(max_examples=25, deadline=None)
@given(
    n_epochs=st.integers(1, 3),
    nlat=st.integers(2, 7),
    nlon=st.integers(2, 9),
    exp=st.integers(-3, 1),
    seed=st.integers(0, 2**31 - 1),
    with_rms=st.booleans(),
)
def test_ionex_roundtrip_random_grids(n_epochs, nlat, nlon, exp, seed,
                                      with_rms):
    """write_ionex -> parse_ionex is the identity on ANY well-formed
    grid: random shapes, spacings, exponents, sentinel patterns, and an
    optional RMS pass (the reference's reciprocity gate generalized from
    the fixed CKMG grid to fuzzed geometries)."""
    from ionex_spark.core.ionex_io import IonexHeader, parse_ionex, write_ionex
    from ionex_spark.core.linspace import Grid, Linspace

    rng = np.random.default_rng(seed)
    lat0 = float(rng.integers(-8, 4)) * 10.0
    dlat = float(rng.integers(1, 4)) * 2.5
    lon0 = float(rng.integers(-18, 0)) * 10.0
    dlon = float(rng.integers(1, 4)) * 5.0
    g = Grid(
        lat=Linspace(lat0, lat0 + (nlat - 1) * dlat, dlat),
        lon=Linspace(lon0, lon0 + (nlon - 1) * dlon, dlon),
        alt=Linspace(450.0, 450.0, 0.0),
    )
    epochs = (
        np.datetime64("2022-01-02T00:00:00")
        + np.arange(n_epochs) * np.timedelta64(3600, "s")
    ).astype("datetime64[s]")
    dense = rng.integers(-999, 1000, size=(n_epochs, nlat, nlon)).astype(
        np.int64
    )
    # random missing points
    mask = rng.random(dense.shape) < 0.1
    dense[mask] = 9999
    rms = None
    if with_rms:
        rms = rng.integers(0, 100, size=dense.shape).astype(np.int64)
    hdr = IonexHeader(
        grid=g,
        interval_s=3600,
        epoch_first=epochs[0],
        epoch_last=epochs[-1],
        number_of_maps=n_epochs,
        exponent=exp,
    )
    text = write_ionex(hdr, epochs, dense, rms)
    h2, ep2, tec2, rms2 = parse_ionex(text)
    assert h2.exponent == exp
    assert h2.grid.lat == g.lat and h2.grid.lon == g.lon
    np.testing.assert_array_equal(ep2, epochs)
    np.testing.assert_array_equal(tec2, dense)
    if with_rms:
        np.testing.assert_array_equal(rms2, rms)
    else:
        assert rms2 is None


# ------------------------------------------------ gap-fill vs pandas twin

def test_gap_fill_matches_pandas_interpolate(spark):
    """Property: gap_fill_series == pandas interpolate(method='index',
    limit_area='inside') on randomized gap patterns."""
    import numpy as np
    import pandas as pd

    from ionex_spark.operators.spatial import gap_fill_series

    rng = np.random.default_rng(11)
    n_slots, keys = 16, 6
    rows = []
    for key in range(keys):
        present = rng.random(n_slots) > 0.35
        if not present.any():
            present[rng.integers(n_slots)] = True
        for s in range(n_slots):
            if present[s]:
                rows.append((key, s, float(rng.integers(0, 1000)) / 8.0))
    sparse = spark.createDataFrame(
        rows, "k bigint, slot int, tecu double"
    )
    got = (
        gap_fill_series(sparse, n_slots, keys=["k"])
        .toPandas()
        .set_index(["k", "slot"])
        .sort_index()
    )
    pdf = pd.DataFrame(rows, columns=["k", "slot", "tecu"])
    for key, grp in pdf.groupby("k"):
        series = grp.set_index("slot")["tecu"].reindex(range(n_slots))
        want = series.interpolate(method="index", limit_area="inside")
        w = want.dropna()
        g = got.loc[key]
        assert list(g.index) == list(w.index), key
        np.testing.assert_allclose(
            g["tecu_filled"].to_numpy(), w.to_numpy(), rtol=0, atol=1e-12
        )
        gaps = g["was_gap"].astype(bool)
        assert set(g.index[gaps]) == set(w.index) - set(
            series.dropna().index
        ), key


# ---------------------------------------- batched-BPE parity (pure python)

def _bpe_pair_counts(vocab):
    from collections import Counter

    c = Counter()
    for syms, f in vocab.items():
        for x, y in zip(syms, syms[1:]):
            c[(x, y)] += f
    return c


def _bpe_apply(vocab, a, b):
    out = {}
    for syms, f in vocab.items():
        merged, pend = [], None
        for s in syms:
            if pend is None:
                pend = s
            elif pend == a and s == b:
                merged.append(a + b)
                pend = None
            else:
                merged.append(pend)
                pend = s
        if pend is not None:
            merged.append(pend)
        t = tuple(merged)
        out[t] = out.get(t, 0) + f
    return out


def _bpe_rank(counts):
    return sorted(
        ((a, b, n) for (a, b), n in counts.items()),
        key=lambda t: (-t[2], t[0], t[1]),
    )


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=7),
        min_size=1,
        max_size=6,
    ),
    st.integers(1, 8),
    st.sampled_from([2, 3, 8]),
)
def test_bpe_batch_selection_equals_sequential(words, n_merges, batch):
    """select_merge_batch's safe-prefix claim, stress-tested: for random
    tiny-alphabet corpora (maximal pair interaction, self-pairs, concat
    collisions — the regime where the review found the self-pair hole),
    simulated batched training must produce EXACTLY the sequential
    merge list and final vocabulary.  Pure Python — the simulation
    mirrors bpe_train's collect limit max(2*want, 16) precisely."""
    from collections import Counter

    from ionex_spark.operators.text import select_merge_batch

    base = Counter(words)
    vocab0 = {tuple(w): f for w, f in base.items()}

    # sequential reference
    seq_vocab, seq_merges = dict(vocab0), []
    for _ in range(n_merges):
        counts = _bpe_pair_counts(
            {s: f for s, f in seq_vocab.items() if len(s) >= 2}
        )
        if not counts:
            break
        a, b, _n = _bpe_rank(counts)[0]
        seq_merges.append((a, b))
        seq_vocab = _bpe_apply(seq_vocab, a, b)

    # batched path through the real selector
    b_vocab, b_merges = dict(vocab0), []
    while len(b_merges) < n_merges:
        counts = _bpe_pair_counts(
            {s: f for s, f in b_vocab.items() if len(s) >= 2}
        )
        if not counts:
            break
        want = min(batch, n_merges - len(b_merges))
        ranked = _bpe_rank(counts)[: max(2 * want, 16)]
        picked = select_merge_batch(ranked, want)
        b_merges.extend(picked)
        for a, bb in picked:
            b_vocab = _bpe_apply(b_vocab, a, bb)

    assert b_merges == seq_merges, (words, n_merges, batch)
    assert b_vocab == seq_vocab, (words, n_merges, batch)


# ------------------------------------------- mixture threshold algebra

_domain_st = st.dictionaries(
    st.sampled_from(["a", "b", "c", "d", "e"]),
    st.tuples(st.integers(1, 10**9), st.integers(1, 1_000_000)),
    min_size=1,
    max_size=5,
)


@given(_domain_st)
@settings(max_examples=200, deadline=None)
def test_mixture_thresholds_properties(domains):
    """For ANY counts/weights: (1) no threshold exceeds the hash gate
    (never upsamples); (2) at least one domain is the binding
    constraint (maximality: its threshold is within one granularity
    unit of the gate-exact expectation for the chosen epoch); (3) the
    expected composition deviates from the ppm targets only by the
    1/10000 hash-gate granularity; (4) exact agreement with a
    fractions.Fraction re-derivation."""
    from fractions import Fraction

    from ionex_spark.operators.shards import mixture_thresholds

    counts = {d: c for d, (c, _) in domains.items()}
    weights = {d: w for d, (_, w) in domains.items()}

    # (4) independent exact re-derivation
    c_exact = min(Fraction(counts[d] * 10**6, w) for d, w in weights.items())
    c_floor = int(c_exact)
    expected = {
        d: int(Fraction(10**4 * c_floor * w, 10**6 * counts[d]))
        for d, w in weights.items()
    }
    if any(t == 0 for t in expected.values()):
        # ADVICE r6 guard: a positively-weighted domain whose threshold
        # floors to 0 would silently contribute zero rows — the operator
        # must refuse instead of emitting a skewed mixture
        import pytest

        with pytest.raises(ValueError, match="floors to 0"):
            mixture_thresholds(counts, weights)
        return
    thr = mixture_thresholds(counts, weights)
    for d, w in weights.items():
        assert thr[d] == expected[d]
    # (1) never upsample
    assert all(0 <= t <= 10_000 for t in thr.values())
    # (3) composition within granularity: expected kept per domain is
    # thr*count/1e4; target is c_floor*w/1e6; they differ < count/1e4
    for d, w in weights.items():
        expected_kept = Fraction(thr[d] * counts[d], 10**4)
        target = Fraction(c_floor * w, 10**6)
        assert abs(expected_kept - target) <= Fraction(counts[d], 10**4)
