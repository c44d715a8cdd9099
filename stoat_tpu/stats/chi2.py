"""Batched Pearson chi-squared tests for 2x2 and 2xN contingency tables.

Vectorized re-design of FisherKhi2::chi2_2x2 / chi2_2xN
(/root/reference/src/stats_test.cpp:181-257).  One call tests a whole batch
of snarls at once; invalid-margin cases yield NaN (rendered "NA" downstream).

Semantics replicated exactly:
  - any zero row/column margin  -> NA            (stats_test.cpp:189,229-234)
  - zero expected count         -> DBL_MAX value (stats_test.cpp:196-197;
    unreachable for 2x2 given the margin checks, kept for parity)
  - stat > 85 -> full-precision tail, else 1-cdf double rounding (see
    stoat_tpu.stats.special.chi2_sf)
  - 2xN: df = N-1 where N counts *kept* (unmasked) columns.
"""

from __future__ import annotations

from stoat_tpu import jaxconfig  # noqa: F401

import jax
import jax.numpy as jnp

from stoat_tpu.stats.special import chi2_sf

__all__ = ["chi2_2x2", "chi2_2xn", "chi2_2x2_stat", "chi2_2xn_stat",
           "finish_chi2_pvalues"]

_DBL_MAX = 1.7976931348623157e308


@jax.jit
def chi2_2x2_stat(a, b, c, d):
    """Chi-squared statistic for batched 2x2 tables, *without* the tail.

    Returns ``(stat, invalid, zero_expected)``.  The tail must then be
    evaluated via :func:`finish_chi2_pvalues` — and, crucially, *outside*
    any ``shard_map`` region: ``chi2_sf``'s igammac inner loop compiles
    pathologically slowly (minutes) under manual partitioning, exactly
    like ``lax.betainc`` in the OLS kernel (see stats/linreg.py).
    """
    a = jnp.asarray(a, jnp.float64)
    b = jnp.asarray(b, jnp.float64)
    c = jnp.asarray(c, jnp.float64)
    d = jnp.asarray(d, jnp.float64)

    row1 = a + b
    row2 = c + d
    col1 = a + c
    col2 = b + d
    total = row1 + row2

    invalid = (row1 == 0) | (row2 == 0) | (col1 == 0) | (col2 == 0)
    safe_total = jnp.where(invalid, 1.0, total)

    ea = row1 * col1 / safe_total
    eb = row1 * col2 / safe_total
    ec = col1 * row2 / safe_total
    ed = col2 * row2 / safe_total

    zero_expected = (ea == 0) | (eb == 0) | (ec == 0) | (ed == 0)
    ea_s = jnp.where(zero_expected, 1.0, ea)
    eb_s = jnp.where(zero_expected, 1.0, eb)
    ec_s = jnp.where(zero_expected, 1.0, ec)
    ed_s = jnp.where(zero_expected, 1.0, ed)

    stat = (
        (a - ea_s) ** 2 / ea_s
        + (b - eb_s) ** 2 / eb_s
        + (c - ec_s) ** 2 / ec_s
        + (d - ed_s) ** 2 / ed_s
    )
    return stat, invalid, zero_expected


@jax.jit
def chi2_2x2(a, b, c, d):
    """Chi-squared p-values for batched 2x2 tables [g0=(a,b); g1=(c,d)].

    Args are equal-shaped float/int arrays.  Returns float64 p-values with
    NaN for NA cases.
    """
    stat, invalid, zero_expected = chi2_2x2_stat(a, b, c, d)
    p = chi2_sf(stat, jnp.ones_like(stat))
    p = jnp.where(zero_expected, _DBL_MAX, p)
    return jnp.where(invalid, jnp.nan, p)


@jax.jit
def chi2_2xn_stat(g0, g1, col_mask):
    """Chi-squared statistic + df for batched 2xN tables (no tail).

    Returns ``(stat, df, invalid)``; finish with
    :func:`finish_chi2_pvalues` outside any shard_map region.
    """
    g0 = jnp.where(col_mask, jnp.asarray(g0, jnp.float64), 0.0)
    g1 = jnp.where(col_mask, jnp.asarray(g1, jnp.float64), 0.0)

    col_totals = g0 + g1
    total = jnp.sum(col_totals, axis=-1)
    row0 = jnp.sum(g0, axis=-1)
    row1 = jnp.sum(g1, axis=-1)
    ncols = jnp.sum(col_mask, axis=-1)

    any_zero_col = jnp.any(col_mask & (col_totals == 0), axis=-1)
    invalid = (total == 0) | (row0 == 0) | (row1 == 0) | any_zero_col

    safe_total = jnp.where(total == 0, 1.0, total)
    e0 = row0[..., None] * col_totals / safe_total[..., None]
    e1 = row1[..., None] * col_totals / safe_total[..., None]
    e0 = jnp.where(col_mask & (e0 > 0), e0, 1.0)
    e1 = jnp.where(col_mask & (e1 > 0), e1, 1.0)

    term0 = jnp.where(col_mask, (g0 - e0) ** 2 / e0, 0.0)
    term1 = jnp.where(col_mask, (g1 - e1) ** 2 / e1, 0.0)
    stat = jnp.sum(term0 + term1, axis=-1)

    df = jnp.maximum(ncols - 1, 1).astype(jnp.float64)
    return stat, df, invalid


@jax.jit
def chi2_2xn(g0, g1, col_mask):
    """Chi-squared p-values for batched 2xN tables with column masks.

    Args:
      g0, g1: [B, Pmax] float arrays of group counts per path (padded).
      col_mask: [B, Pmax] bool, True for real (kept) columns.

    Returns [B] float64 p-values (NaN = NA).  df = kept_cols - 1.
    """
    stat, df, invalid = chi2_2xn_stat(g0, g1, col_mask)
    p = chi2_sf(stat, df)
    return jnp.where(invalid, jnp.nan, p)


@jax.jit
def finish_chi2_pvalues(stat, df, invalid, zero_expected):
    """Tail evaluation for statistics produced by the ``*_stat`` kernels.

    Kept separate so sharded pipelines can compute the (cheap, elementwise)
    statistics inside ``shard_map`` and run the igammac tail out here where
    XLA compiles it in seconds instead of minutes.
    """
    p = chi2_sf(stat, df)
    p = jnp.where(zero_expected, _DBL_MAX, p)
    return jnp.where(invalid, jnp.nan, p)
