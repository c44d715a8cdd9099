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

__all__ = ["linear_regression_batch", "ldlt_unpivoted", "masked_pinv_inverse"]

_LDLT_TOL = 1e-10  # stats_test.cpp:401
_PINV_TOL = 1e-6   # stats_test.cpp:386


def ldlt_unpivoted(A):
    """Unpivoted LDL^T decomposition of batched symmetric matrices.

    Returns the D vector only (the rank-deficiency probe).  A: [B, P, P].
    """
    B, P, _ = A.shape

    def body(j, carry):
        L, D = carry
        # D_j = A_jj - sum_{k<j} L_jk^2 D_k
        mask_k = jnp.arange(P) < j
        Lj = L[:, j, :]  # [B, P]
        dj = A[:, j, j] - jnp.sum(jnp.where(mask_k, Lj * Lj * D, 0.0), axis=-1)
        D = D.at[:, j].set(dj)
        # L_ij = (A_ij - sum_{k<j} L_ik L_jk D_k) / D_j   for i > j
        cross = jnp.einsum("bik,bk->bi", jnp.where(mask_k[None, None, :], L, 0.0),
                           jnp.where(mask_k[None, :], Lj * D, 0.0))
        dj_safe = jnp.where(dj == 0.0, 1.0, dj)
        col = (A[:, :, j] - cross) / dj_safe[:, None]
        rows_below = jnp.arange(P) > j
        L = L.at[:, :, j].set(jnp.where(rows_below[None, :], col, L[:, :, j]))
        L = L.at[:, j, j].set(1.0)
        return L, D

    L0 = jnp.zeros_like(A)
    D0 = jnp.zeros(A.shape[:2], A.dtype)
    _, D = lax.fori_loop(0, P, body, (L0, D0))
    return D


def masked_pinv_inverse(A, tol=_PINV_TOL):
    """SVD pseudo-inverse with absolute tolerance (stats_test.cpp:383-396)."""
    U, s, Vt = jnp.linalg.svd(A, full_matrices=False)
    sinv = jnp.where(s > tol, 1.0 / jnp.where(s > tol, s, 1.0), 0.0)
    return jnp.einsum("bij,bj,bkj->bik", Vt.transpose(0, 2, 1), sinv, U)


@jax.jit
def linear_regression_batch(X, y, row_mask, ncols):
    """Batched OLS over padded design matrices.

    Args:
      X: [B, N, P] float64 — rows for excluded samples must be all-zero
         (including the intercept column); padded columns all-zero.
      y: [B, N] float64 — 0 for excluded rows.
      row_mask: [B, N] bool — True for included samples.
      ncols: [B] int — actual number of design columns (incl. intercept).

    Returns (p, beta1, se1, r2): each [B] float64.  The caller is responsible
    for NA-masking snarls that were filtered out entirely.
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

    D = ldlt_unpivoted(XtX)
    bad_d = real_col & ((jnp.abs(D) < _LDLT_TOL) | ~jnp.isfinite(D))
    rank_deficient = jnp.any(bad_d, axis=-1)

    eye = jnp.broadcast_to(jnp.eye(P, dtype=X.dtype), (B, P, P))
    inv_direct = jnp.linalg.solve(XtX, eye)
    inv_pinv = masked_pinv_inverse(XtX)
    XtXinv = jnp.where(rank_deficient[:, None, None], inv_pinv, inv_direct)

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

    p = student_t_sf2(jnp.abs(t1), df_res)
    p = jnp.where(jnp.isfinite(t1), p, 1.0)  # stats_test.cpp:480-482
    return p, beta1, se1, r2
