"""Property-based tests (hypothesis) for kernel invariants — SURVEY §5's
property-test plank. No Spark."""

import numpy as np
from hypothesis import given, settings, strategies as st

from photohive_spark import kernels as K
from photohive_spark.config import DEFAULT_CONFIG as CFG, VOCAB_SIZE

tokens_arrays = st.lists(st.integers(0, VOCAB_SIZE - 1),
                         min_size=0, max_size=400).map(
    lambda l: np.array(l, dtype=np.int32))


@given(tokens_arrays)
@settings(max_examples=60, deadline=None)
def test_histogram_partitions_all_tokens(t):
    h, s, v = K.derive_hsv(t)
    counts = K.token_histogram(h, s, v)
    assert counts.sum() == len(t)
    assert (counts >= 0).all() and len(counts) == CFG.hist_cells


@given(tokens_arrays)
@settings(max_examples=60, deadline=None)
def test_entropy_bounds(t):
    h, s, v = K.derive_hsv(t)
    counts = K.token_histogram(h, s, v)
    e = K.entropy(counts)
    assert 0.0 <= e <= np.log(CFG.hist_cells) + 1e-12


@given(tokens_arrays)
@settings(max_examples=60, deadline=None)
def test_palette_percentages_sum_to_coverage(t):
    h, s, v = K.derive_hsv(t)
    pal = K.palette(h, s, v)
    total_pct = sum(p[3] for p in pal)
    if len(t) == 0:
        assert pal == []
    else:
        # every token is assigned to some parent -> percentages sum to 1
        assert abs(total_pct - 1.0) < 1e-9
        for hh, ss, vv, pct in pal:
            assert 0.0 <= hh <= 360.0 and 0.0 <= pct <= 1.0


@given(tokens_arrays)
@settings(max_examples=40, deadline=None)
def test_autocorr_lag0_and_bounds(t):
    ac = K.autocorr(t.astype(np.float64) / VOCAB_SIZE)
    assert len(ac) == CFG.autocorr_lags
    if len(t) >= 2 and np.var(t) > 0:
        assert ac[0] == 1.0
        assert (np.abs(ac) <= 1.0 + 1e-9).all()


@given(tokens_arrays)
@settings(max_examples=40, deadline=None)
def test_spectrum_bands_fixed_width_nonneg(t):
    b = K.spectrum_bands(t.astype(np.float64) / VOCAB_SIZE)
    assert len(b) == CFG.radius_parts
    # lognorm maps into ~[0,1]; empty bins are exactly 0
    assert (b >= 0.0).all() and (b <= 1.0 + 1e-9).all()


@given(st.integers(0, 10**12))
@settings(max_examples=200, deadline=None)
def test_newton_int_sqrt_property(v):
    r = int(K.newton_int_sqrt(np.array([float(v)]))[0])
    # Newton iterate truncation: r is within 1 of floor(sqrt(v))
    assert abs(r - int(np.floor(np.sqrt(v)))) <= 1


@given(st.lists(st.floats(-1e3, 1e3), min_size=6, max_size=200),
       st.integers(2, 5))
@settings(max_examples=40, deadline=None)
def test_convolve_circular_linearity(xs, k):
    x = np.array(xs)
    h = np.ones(k)
    y1 = K.convolve_circular(2.0 * x, h)
    y2 = 2.0 * K.convolve_circular(x, h)
    assert np.allclose(y1, y2, rtol=1e-9, atol=1e-9)


@given(tokens_arrays, st.integers(1, 8))
@settings(max_examples=40, deadline=None)
def test_downsample_is_stride(t, r):
    d = K.downsample(t, r)
    assert (np.asarray(d) == np.asarray(t)[::r]).all()
