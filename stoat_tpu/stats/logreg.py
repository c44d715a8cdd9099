"""Batched IRLS logistic regression with Wald tests and Holm selection.

Vectorized re-design of LogisticRegression::logistic_regression
(/root/reference/src/stats_test.cpp:49-176): L2 penalty 1e-4, max 100
iterations, convergence tolerance 1e-6 on ||beta - beta_old||, weight clamp
[1e-8, 1], Wald z-test per variant column, Holm adjustment + minimum
selection when a snarl has more than one variant column.

Faithfully replicated reference behaviours:
  - Covariates are NOT included in the design matrix.  The reference
    declares shadowed locals at stats_test.cpp:59-62, so ``num_covariates``
    stays 0 and the model is always [intercept | variant dosages].  We
    reproduce that (the binary+covariate mode therefore ignores covariates,
    exactly like the C++).
  - Non-convergence after 100 iterations returns NA (stats_test.cpp:119).
  - A failed linear solve returns NA (stats_test.cpp:107); we detect
    non-finite updates.

Batching: fixed 100 ``lax.fori_loop`` iterations with per-lane masked
updates — a converged lane's beta is frozen, reproducing the reference's
``break`` semantics.
"""

from __future__ import annotations

from stoat_tpu import jaxconfig  # noqa: F401

import jax
import jax.numpy as jnp
from jax import lax

from stoat_tpu.stats.special import normal_sf2
from stoat_tpu.stats.linalg import ldlt_inverse, ldlt_solve

__all__ = ["logistic_regression_batch"]

_MAX_ITER = 100      # stats_test.hpp:109
_TOL = 1e-6          # stats_test.hpp:110
_L2 = 1e-4           # stats_test.hpp:111
_EPS = 1e-8          # stats_test.hpp:112


@jax.jit
def logistic_regression_batch(X, y, row_mask, ncols):
    """Batched penalized IRLS over padded design matrices.

    Args:
      X: [B, N, P] float64 — [intercept | variant dosage columns], padded
         columns all-zero, excluded-sample rows all-zero.
      y: [B, N] float64 binary phenotype (0/1), 0 for excluded rows.
      row_mask: [B, N] bool.
      ncols: [B] int — actual feature count (intercept + variants).

    Returns (p, beta_sel, se_sel): [B] float64 each, NaN where the
    reference returns "NA".
    """
    X = jnp.asarray(X, jnp.float64)
    y = jnp.asarray(y, jnp.float64)
    row_mask = jnp.asarray(row_mask, bool)
    B, N, P = X.shape

    col_idx = jnp.arange(P)
    real_col = col_idx[None, :] < ncols[:, None]        # [B, P]
    eye = jnp.eye(P, dtype=X.dtype)[None]

    def hessian_of(beta):
        z = jnp.einsum("bnp,bp->bn", X, beta)
        prob = jax.nn.sigmoid(z)
        w = jnp.clip(prob * (1.0 - prob), _EPS, 1.0)
        w = jnp.where(row_mask, w, 0.0)
        H = jnp.einsum("bnp,bn,bnq->bpq", X, w, X) + _L2 * eye
        return H, prob

    def body(_, carry):
        beta, beta_old, active, failed = carry
        H, prob = hessian_of(beta)
        grad = jnp.einsum("bnp,bn->bp", X, jnp.where(row_mask, y - prob, 0.0))
        grad = grad - _L2 * beta
        delta = ldlt_solve(H, grad[..., None])[..., 0]
        bad = ~jnp.all(jnp.isfinite(delta), axis=-1)
        step = jnp.where(active[:, None] & ~bad[:, None], delta, 0.0)
        new_beta = beta + step
        diff = jnp.sqrt(jnp.sum((new_beta - beta_old) ** 2, axis=-1))
        newly_converged = active & ~bad & (diff < _TOL)
        failed = failed | (active & bad)
        active = active & ~newly_converged & ~bad
        beta_old = jnp.where(active[:, None], new_beta, beta_old)
        return new_beta, beta_old, active, failed

    # initial carries derive from X so shard_map varying types match
    zero_b = X[:, 0, 0] * 0.0
    beta0 = jnp.zeros((B, P), X.dtype) + zero_b[:, None]
    active0 = zero_b < 1.0
    failed0 = zero_b > 1.0
    beta, _, active, failed = lax.fori_loop(
        0, _MAX_ITER, body, (beta0, beta0, active0, failed0))

    # Still-active lanes never converged -> NA (stats_test.cpp:119)
    na = active | failed

    # Final covariance from the converged beta (stats_test.cpp:122-136)
    H, _ = hessian_of(beta)
    cov = ldlt_inverse(H)
    se = jnp.sqrt(jnp.diagonal(cov, axis1=1, axis2=2))

    # Wald two-sided p per variant column (skip intercept)
    z_score = beta / se
    p_all = normal_sf2(jnp.abs(z_score))
    variant_col = real_col & (col_idx[None, :] >= 1)    # [B, P]

    # Holm step-down over the variant columns, then pick the minimum
    # (first occurrence), matching stats_test.cpp:157-167.  For a single
    # variant column this reduces to the unadjusted p.
    m = jnp.sum(variant_col, axis=-1).astype(jnp.float64)        # [B]
    p_masked = jnp.where(variant_col, p_all, jnp.inf)
    order = jnp.argsort(p_masked, axis=-1, stable=True)
    p_sorted = jnp.take_along_axis(p_masked, order, axis=-1)
    valid_sorted = jnp.isfinite(p_sorted)
    i = jnp.arange(P, dtype=jnp.float64)[None, :]
    raw = jnp.minimum((m[:, None] - i) * jnp.where(valid_sorted, p_sorted, 0.0), 1.0)
    adj_sorted = lax.cummax(jnp.where(valid_sorted, raw, jnp.inf), axis=1)
    adj = jnp.full((B, P), jnp.inf).at[
        jnp.arange(B)[:, None], order].set(adj_sorted)

    # min_element over the variant columns (first minimal index)
    sel = jnp.argmin(jnp.where(variant_col, adj, jnp.inf), axis=-1)
    bidx = jnp.arange(B)
    p_out = adj[bidx, sel]
    beta_out = beta[bidx, sel]
    se_out = se[bidx, sel]

    nanv = jnp.full((B,), jnp.nan)
    return (jnp.where(na, nanv, p_out),
            jnp.where(na, nanv, beta_out),
            jnp.where(na, nanv, se_out))
