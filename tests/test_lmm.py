"""LMM (kinship mixed model): numerics validation.

The reference declares-but-never-implements its LMM (stats_test.hpp:
115-125), so there is no oracle to pin against; validation is therefore
against independent dense linear algebra:

  1. the rotated REML log-likelihood == an unrotated evaluation using
     full Sigma = K + delta*I solves,
  2. REML recovers the simulated variance ratio,
  3. the batched rotated-OLS solve == per-snarl dense GLS,
  4. with K = I the LMM collapses to plain OLS (identical t statistics).
"""

import numpy as np
import pytest

import stoat_tpu.jaxconfig  # noqa: F401
import jax

jax.config.update("jax_platforms", "cpu")

from stoat_tpu.stats.lmm import (LmmContext, fit_null_reml,
                                 lmm_regression_batch, reml_loglik)


def random_kinship(n, rng, rank=None):
    G = rng.normal(size=(n, rank or n))
    K = G @ G.T / (rank or n)
    d = np.sqrt(np.diag(K))
    return K / np.outer(d, d)


def dense_reml(delta, K, y, X0):
    """Independent, unrotated REML evaluation with full-Sigma solves."""
    n, q = X0.shape
    Sigma = K + delta * np.eye(n)
    Si = np.linalg.inv(Sigma)
    XtSiX = X0.T @ Si @ X0
    beta = np.linalg.solve(XtSiX, X0.T @ Si @ y)
    r = y - X0 @ beta
    R = float(r @ Si @ r)
    _s, ld_Sigma = np.linalg.slogdet(Sigma)
    _s, ld_XtSiX = np.linalg.slogdet(XtSiX)
    _s, ld_XtX = np.linalg.slogdet(X0.T @ X0)
    nq = n - q
    return 0.5 * (nq * np.log(nq / (2 * np.pi)) - nq - nq * np.log(R)
                  - ld_Sigma - ld_XtSiX + ld_XtX)


def test_reml_loglik_matches_dense():
    rng = np.random.default_rng(0)
    n = 60
    K = random_kinship(n, rng)
    y = rng.normal(size=n)
    X0 = np.column_stack([np.ones(n), rng.normal(size=n)])
    S, U = np.linalg.eigh(K)
    S = np.clip(S, 0, None)
    yt, X0t = U.T @ y, U.T @ X0
    _s, ld = np.linalg.slogdet(X0.T @ X0)
    for delta in (0.01, 0.3, 1.0, 7.5, 100.0):
        a = reml_loglik(delta, S, yt, X0t, ld)
        b = dense_reml(delta, K, y, X0)
        assert a == pytest.approx(b, rel=1e-9), delta


def test_reml_recovers_variance_ratio():
    rng = np.random.default_rng(1)
    n = 500
    K = random_kinship(n, rng, rank=100)
    L = np.linalg.cholesky(K + 1e-9 * np.eye(n))
    sg, se = 2.0, 1.0   # true delta = 0.5
    y = 3.0 + np.sqrt(sg) * (L @ rng.normal(size=n)) \
        + np.sqrt(se) * rng.normal(size=n)
    ctx = fit_null_reml(y, K)
    assert ctx.delta == pytest.approx(se / sg, rel=0.5)
    assert 0.4 < ctx.heritability < 0.85
    # optimum really is a maximum on the grid neighbourhood
    S, U = np.linalg.eigh(K)
    S = np.clip(S, 0, None)
    yt, X0t = U.T @ y, (U.T @ np.ones((n, 1)))
    _s, ld = np.linalg.slogdet(np.ones((1, 1)) * n)
    for mul in (0.5, 2.0):
        assert reml_loglik(ctx.delta * mul, S, yt, X0t, ld) <= \
            ctx.loglik + 1e-9


def test_batched_gls_matches_dense():
    rng = np.random.default_rng(2)
    n, n_snarls, p = 40, 7, 3
    K = random_kinship(n, rng)
    y = rng.normal(size=n)
    ctx = fit_null_reml(y, K)
    Sigma = K + ctx.delta * np.eye(n)
    Si = np.linalg.inv(Sigma)

    X = np.zeros((n_snarls, n, p + 1))
    ncols = np.full(n_snarls, p, np.int32)
    for s in range(n_snarls):
        X[s, :, 0] = 1.0
        X[s, :, 1:p] = rng.integers(0, 3, size=(n, p - 1))
        # padded column stays zero
    pj, bj, sej, _ = lmm_regression_batch(X, ctx, ncols)

    for s in range(n_snarls):
        Xs = X[s, :, :p]
        XtSiX = Xs.T @ Si @ Xs
        beta = np.linalg.solve(XtSiX, Xs.T @ Si @ y)
        r = y - Xs @ beta
        df = n - p + 1
        sigma2 = (r @ Si @ r) / df
        se_1 = np.sqrt(np.linalg.inv(XtSiX)[1, 1] * sigma2)
        assert float(bj[s]) == pytest.approx(beta[1], rel=1e-8)
        assert float(sej[s]) == pytest.approx(se_1, rel=1e-8)


def test_identity_kinship_reduces_to_ols():
    rng = np.random.default_rng(3)
    n, p = 50, 3
    y = rng.normal(size=n)
    X = np.zeros((1, n, p + 1))
    X[0, :, 0] = 1.0
    X[0, :, 1:p] = rng.integers(0, 3, size=(n, p - 1))
    ctx = fit_null_reml(y, np.eye(n))
    p_lmm, b_lmm, se_lmm, _ = lmm_regression_batch(
        X, ctx, np.array([p], np.int32))

    from stoat_tpu.stats.linreg import linear_regression_batch
    import jax.numpy as jnp
    p_ols, b_ols, se_ols, _ = linear_regression_batch(
        jnp.asarray(X), jnp.asarray(y[None, :]),
        jnp.ones((1, n), bool), jnp.array([p], np.int32))
    # rotation by an orthogonal matrix times a scalar leaves t unchanged
    assert float(b_lmm[0]) == pytest.approx(float(b_ols[0]), rel=1e-8)
    assert float(p_lmm[0]) == pytest.approx(float(p_ols[0]), rel=1e-6)


def test_lmm_controls_structure_inflation():
    """Structured phenotype: LMM p-values are less inflated than OLS on
    null (non-causal) variants correlated with the structure."""
    rng = np.random.default_rng(4)
    n = 200
    group = np.repeat([0, 1], n // 2)
    K = 0.9 * (group[:, None] == group[None, :]).astype(float) \
        + 0.1 * np.eye(n)
    L = np.linalg.cholesky(K + 1e-9 * np.eye(n))
    y = 2.0 * (L @ rng.normal(size=n)) + 0.5 * rng.normal(size=n)

    n_var = 60
    X = np.zeros((n_var, n, 3))
    X[:, :, 0] = 1.0
    for v in range(n_var):
        # allele frequency differs by group (confounded, non-causal)
        freq = np.where(group == 0, 0.2, 0.8)
        X[v, :, 1] = rng.binomial(2, freq)
    ncols = np.full(n_var, 2, np.int32)

    ctx = fit_null_reml(y, K)
    p_lmm, *_ = lmm_regression_batch(X, ctx, ncols)

    from stoat_tpu.stats.linreg import linear_regression_batch
    import jax.numpy as jnp
    p_ols, *_ = linear_regression_batch(
        jnp.asarray(X), jnp.broadcast_to(jnp.asarray(y), (n_var, n)),
        jnp.ones((n_var, n), bool), jnp.asarray(ncols))

    import scipy.stats
    def lambda_gc(p):
        chi = scipy.stats.chi2.isf(np.asarray(p), 1)
        return np.median(chi) / scipy.stats.chi2.ppf(0.5, 1)

    assert lambda_gc(p_lmm) < lambda_gc(p_ols)
    assert lambda_gc(p_lmm) < 3.0   # near 1 in expectation; generous bound


def _fixture_packed(tmp_path, n_samples=40, n_snarls=30, seed=11):
    from fixtures import make_fixture
    from stoat_tpu.io.snarl_file import parse_snarl_path
    from stoat_tpu.pipeline.runner import iter_chromosome_matrices
    from stoat_tpu.tables import pack_chromosome
    from stoat_tpu.io.phenotype import parse_quantitative_pheno
    paths = make_fixture(str(tmp_path), n_samples=n_samples,
                         n_snarls=n_snarls, seed=seed)
    snarls_chr = parse_snarl_path(paths["snarl"])
    chrom, matrix = next(iter_chromosome_matrices(
        paths["vcf"], 2 * n_samples, snarls_chr))
    packed = pack_chromosome(snarls_chr[chrom], matrix)
    from stoat_tpu.io.phenotype import parse_binary_pheno
    _, samples = parse_binary_pheno(paths["binary"], list(paths["samples"]))
    pheno_q = parse_quantitative_pheno(paths["quantitative"], samples)
    return paths, packed, pheno_q, samples


def test_pipeline_identity_kinship_matches_ols_on_full_snarls(tmp_path):
    """On snarls where every sample carries a path, EMMAX with K=I equals
    the OLS pipeline row for row."""
    from stoat_tpu.pipeline.quantitative import (
        lmm_analyze_chromosome, quantitative_analyze_chromosome)
    _, packed, pheno_q, samples = _fixture_packed(tmp_path)
    n = len(samples)
    ctx = fit_null_reml(pheno_q, np.eye(n))
    res_lmm = lmm_analyze_chromosome(packed, ctx, None, 3, 5, 0.05)
    res_ols = quantitative_analyze_chromosome(packed, pheno_q, None,
                                              3, 5, 0.05,
                                              return_tables=True)
    full = res_ols["used"].all(axis=1) & ~res_ols["filtered"]
    assert full.sum() >= 3, "fixture should have fully-covered snarls"
    np.testing.assert_allclose(res_lmm["p"][full], res_ols["p"][full],
                               rtol=1e-6)
    np.testing.assert_allclose(res_lmm["beta"][full], res_ols["beta"][full],
                               rtol=1e-6)


def test_cli_lmm_end_to_end(tmp_path):
    from stoat_tpu.cli import main as cli_main
    paths, packed, pheno_q, samples = _fixture_packed(tmp_path)
    n = len(samples)
    rng = np.random.default_rng(5)
    K = random_kinship(n, rng, rank=10)
    kin_path = tmp_path / "kinship.tsv"
    with open(kin_path, "w") as f:
        f.write("id\t" + "\t".join(samples) + "\n")
        for i, s in enumerate(samples):
            f.write(s + "\t" + "\t".join(f"{v:.8f}" for v in K[i]) + "\n")
    out = str(tmp_path / "out_lmm")
    rc = cli_main(["vcf", "-s", paths["snarl"], "-v", paths["vcf"],
                   "-q", paths["quantitative"], "-k", str(kin_path),
                   "--lmm", "-o", out])
    assert not rc
    import os
    rows = open(os.path.join(out, "lmm_table_vcf.tsv")).read().splitlines()
    assert rows[0].startswith("#CHR")
    assert len(rows) > 5
    # every P parses as float or NA
    for r in rows[1:]:
        p = r.split("\t")[5]
        assert p == "NA" or 0.0 <= float(p) <= 1.0

    # default behavior unchanged: -k without --lmm runs plain OLS
    out2 = str(tmp_path / "out_ols")
    rc = cli_main(["vcf", "-s", paths["snarl"], "-v", paths["vcf"],
                   "-q", paths["quantitative"], "-k", str(kin_path),
                   "-o", out2])
    assert not rc
    assert os.path.exists(os.path.join(out2, "quantitative_table_vcf.tsv"))


def test_null_fit_survives_collinear_covariates():
    """Round-5 review: constant/duplicated covariate columns must not
    crash the REML null fit (the OLS path survives the same via its
    pseudo-inverse fallback, stats_test.cpp:398-421)."""
    import numpy as np

    from stoat_tpu.stats.lmm import fit_null_reml

    rng = np.random.default_rng(0)
    n = 30
    A = rng.standard_normal((n, 3))
    K = A @ A.T / 3 + np.eye(n)
    y = rng.standard_normal(n)
    ctx = fit_null_reml(y, K, np.ones((n, 2)))
    assert np.isfinite(ctx.delta)
