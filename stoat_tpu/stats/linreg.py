"""Batched closed-form OLS linear regression with masked rows/columns.

Vectorized re-design of LinearRegression::linear_regression
(/root/reference/src/stats_test.cpp:383-506).  One call solves a whole batch
of per-snarl regressions: design matrices are padded to a common column count
and sample rows are masked (excluded rows have all-zero X rows and y = 0, so
they contribute nothing to the normal equations — exactly equivalent to the
reference's compacted per-snarl tables).

Replicated semantics:
  - X = [intercept | path dosages | covariates]     (stats_test.cpp:440-453)
  - XtX^-1 via LDLT solve, falling back to an SVD pseudo-inverse with
    absolute singular-value tolerance 1e-6 when any LDLT pivot |D| < 1e-10
    (stats_test.cpp:383-421; we use an unpivoted LDLT recursion — Eigen's is
    pivoted, but the |D|min magnitudes agree for the PSD XtX seen here)
  - df_res = max(n - p + 1, 1)                      (stats_test.cpp:467-468)
  - p-value: two-tailed Student-t of the FIRST variant column only; NaN/inf
    t-statistics map to p = 1.0                     (stats_test.cpp:479-487)
  - returns (p, beta[1], se[1], r2)
"""

from __future__ import annotations

from stoat_tpu import jaxconfig  # noqa: F401

import jax
import jax.numpy as jnp
from jax import lax

from stoat_tpu.stats.special import student_t_sf2
from stoat_tpu.stats.linalg import (ldlt_factor, ldlt_solve, sym_pinv)

__all__ = ["linear_regression_batch", "linear_regression_stats_batch",
           "finish_linear_pvalues"]

_LDLT_TOL = 1e-10  # stats_test.cpp:401
_PINV_TOL = 1e-6   # stats_test.cpp:386


@jax.jit
def linear_regression_stats_batch(X, y, row_mask, ncols):
    """Batched OLS returning (t1, df_res, beta1, se1, r2) — everything but
    the t-tail evaluation.

    Split out because ``lax.betainc``'s internal continued-fraction
    while_loop cannot run inside ``shard_map`` (its carry initialisation is
    not varying-aware); the sharded pipeline computes these statistics per
    shard and applies :func:`finish_linear_pvalues` on the gathered result.
    """
    X = jnp.asarray(X, jnp.float64)
    y = jnp.asarray(y, jnp.float64)
    row_mask = jnp.asarray(row_mask, bool)
    B, N, P = X.shape

    col_idx = jnp.arange(P)
    real_col = col_idx[None, :] < ncols[:, None]  # [B, P]
    pad_diag = jnp.where(real_col, 0.0, 1.0)

    XtX = jnp.einsum("bnp,bnq->bpq", X, X)
    XtX = XtX + pad_diag[:, :, None] * jnp.eye(P)[None]

    # Pure-arithmetic LDLT + Jacobi pinv: XLA:TPU has no f64 LU/SVD
    # primitives, and LDLT-against-identity is exactly what Eigen does.
    L, D = ldlt_factor(XtX)
    bad_d = real_col & ((jnp.abs(D) < _LDLT_TOL) | ~jnp.isfinite(D))
    rank_deficient = jnp.any(bad_d, axis=-1)

    eye = jnp.broadcast_to(jnp.eye(P, dtype=X.dtype), (B, P, P))
    Z = ldlt_solve(XtX, eye)
    inv_pinv = sym_pinv(XtX, tol=_PINV_TOL)
    XtXinv = jnp.where(rank_deficient[:, None, None], inv_pinv, Z)

    Xty = jnp.einsum("bnp,bn->bp", X, y)
    beta = jnp.einsum("bpq,bq->bp", XtXinv, Xty)

    y_pred = jnp.einsum("bnp,bp->bn", X, beta)
    resid = jnp.where(row_mask, y - y_pred, 0.0)
    rss = jnp.sum(resid * resid, axis=-1)

    n_used = jnp.sum(row_mask, axis=-1).astype(jnp.float64)
    n_safe = jnp.where(n_used == 0, 1.0, n_used)
    y_mean = jnp.sum(jnp.where(row_mask, y, 0.0), axis=-1) / n_safe
    tss = jnp.sum(jnp.where(row_mask, (y - y_mean[:, None]) ** 2, 0.0), axis=-1)
    r2 = 1.0 - rss / tss

    df_res = jnp.maximum(n_used - ncols.astype(jnp.float64) + 1.0, 1.0)
    mse = rss / df_res

    se = jnp.sqrt(jnp.diagonal(XtXinv, axis1=1, axis2=2) * mse[:, None])
    beta1 = beta[:, 1]
    se1 = se[:, 1]
    t1 = beta1 / se1
    return t1, df_res, beta1, se1, r2


@jax.jit
def finish_linear_pvalues(t1, df_res):
    """Two-tailed Student-t p with NaN/inf -> 1.0 (stats_test.cpp:479-485)."""
    p = student_t_sf2(jnp.abs(t1), df_res)
    return jnp.where(jnp.isfinite(t1), p, 1.0)


@jax.jit
def linear_regression_batch(X, y, row_mask, ncols):
    """Batched OLS over padded design matrices.

    Args:
      X: [B, N, P] float64 — rows for excluded samples must be all-zero
         (including the intercept column); padded columns all-zero.
      y: [B, N] float64 — 0 for excluded rows.
      row_mask: [B, N] bool — True for included samples.
      ncols: [B] int — actual number of design columns (incl. intercept).

    Returns (p, beta1, se1, r2): each [B] float64.  The caller is
    responsible for NA-masking snarls that were filtered out entirely.
    """
    t1, df_res, beta1, se1, r2 = linear_regression_stats_batch(
        X, y, row_mask, ncols)
    return finish_linear_pvalues(t1, df_res), beta1, se1, r2
