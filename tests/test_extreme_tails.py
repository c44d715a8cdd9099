"""Extreme-tail validation: the chi² survival function must match 50-digit
multiprecision arithmetic (the reference's cpp_dec_float_50 branch,
stats_test.cpp:205-252) to well beyond 4 significant digits, across the
stat=85 branch boundary and far into the tail."""

import mpmath
import numpy as np
import pytest

from stoat_tpu.formatting import set_precision
from stoat_tpu.stats.special import chi2_sf
from stoat_tpu.writer import format_p

mpmath.mp.dps = 50


def mp_chi2_sf(stat, df):
    """50-digit regularized upper incomplete gamma Q(df/2, stat/2)."""
    return float(mpmath.gammainc(mpmath.mpf(df) / 2,
                                 a=mpmath.mpf(stat) / 2, regularized=True))


@pytest.mark.parametrize("stat", [
    60.0, 80.0, 84.9, 85.0001, 86.0, 100.0, 200.0, 500.0, 1000.0, 1400.0,
])
@pytest.mark.parametrize("df", [1, 2, 3, 7])
def test_chi2_tail_matches_multiprecision(stat, df):
    ours = float(np.asarray(chi2_sf(np.float64(stat), np.float64(df))))
    exact = mp_chi2_sf(stat, df)
    if stat <= 85.0:
        # double branch: 1 - fl(1 - q); absolute rounding at 1 ulp of 1.0
        assert ours == pytest.approx(exact, rel=1e-6, abs=1.2e-16)
    else:
        # high-precision branch: full relative accuracy like the 50-digit
        # evaluation the reference uses here
        assert ours == pytest.approx(exact, rel=1e-10), (stat, df)
        # and the formatted 4-significant-digit strings agree
        assert format_p(ours) == set_precision(exact)


def test_branch_boundary_underflow_behavior():
    """Just below stat=85 with df=1 the true tail (~3e-20) is smaller than one
    ulp of 1.0, so the reference's double branch 1 - fl(1-q) underflows to
    exactly 0 ("0" in output) — the very reason it switches to 50-digit
    arithmetic above 85 (stats_test.cpp:205-209). Pin both sides."""
    below = float(np.asarray(chi2_sf(np.float64(84.999999), np.float64(1))))
    above = float(np.asarray(chi2_sf(np.float64(85.000001), np.float64(1))))
    assert below == 0.0
    assert format_p(below) == "0"
    assert above == pytest.approx(mp_chi2_sf(85.000001, 1), rel=1e-10)
    assert format_p(above) == "2.9836e-20"


def test_double_branch_last_representable_tail():
    """Largest stats whose double-branch tail is still nonzero: q just above
    one ulp of 1.0 survives the 1-(1-q) round-trip."""
    # df=7, stat=84: q ≈ 2.3e-15 > 2^-52 — representable in the double branch
    ours = float(np.asarray(chi2_sf(np.float64(84.0), np.float64(7))))
    assert ours > 0.0
    exact = mp_chi2_sf(84.0, 7)
    # quantized to multiples of 2^-52 by the 1-(1-q) rounding
    assert abs(ours - exact) <= 2 ** -52


def test_fisher_overflow_tables_return_zero():
    """Round-5 review (platform-real bug): tables whose relative-
    probability scan overflows must return the reference's "0" — the
    emulated-f64 backend evaluates inf > DBL_MAX as False and can
    produce NaN directly at the overflow step, so the guard is
    ~isfinite (stats_test.cpp:312-314 returns "0")."""
    import numpy as np

    from stoat_tpu.formatting import set_precision
    from stoat_tpu.stats.fisher import fisher_exact_2x2

    for t in [(1000, 2, 3, 1500), (2000, 1, 1, 3000),
              (5000, 10, 4, 8000)]:
        p = float(np.asarray(fisher_exact_2x2(*map(float, t))))
        assert np.isfinite(p), t
        assert set_precision(p) == "0", (t, p)
