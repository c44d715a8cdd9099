#!/usr/bin/env python
"""Benchmark: snarls tested per second per chip (binary chi²+Fisher and
quantitative OLS pipelines), per BASELINE.md.

Prints exactly one JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The workload mirrors the reference's simulated test scale (200 samples,
tests/simu/config/config_binary.yaml) but with many more snarls so the
device pipeline is saturated.  The baseline is a single-core scalar
per-snarl loop (C-backed scipy chi2/Fisher + numpy OLS) replicating the
reference's per-snarl algorithm — the honest stand-in for single-core C++
`stoat` until the native core ships; its per-snarl cost is measured on a
subsample and extrapolated.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import stoat_tpu.jaxconfig  # noqa: F401  (x64 + backend fallback)
import jax
import jax.numpy as jnp

N_SAMPLES = 200
N_SNARLS = 8192
BASELINE_SAMPLE = 300
SEED = 42


def make_workload(rng, n_snarls=N_SNARLS, n_samples=N_SAMPLES):
    """Synthesize packed arrays directly: snarl k has n_k in {2,3,4} paths,
    each path = 2 edges; haplotypes pick one path per snarl."""
    H = 2 * n_samples
    n_paths_per_snarl = rng.integers(2, 5, n_snarls)
    P_real = int(n_paths_per_snarl.sum())
    E = 2 * P_real

    # per-path haplotype assignment
    path_offset = np.zeros(n_snarls + 1, np.int64)
    np.cumsum(n_paths_per_snarl, out=path_offset[1:])

    M = np.zeros((E, H), bool)
    coo_path = np.arange(P_real, np.int64).repeat(2) if False else \
        np.repeat(np.arange(P_real), 2)
    coo_row = np.arange(E)
    n_edges = np.full(P_real, 2, np.int32)
    valid = np.ones(P_real, bool)

    for s in range(n_snarls):
        k = n_paths_per_snarl[s]
        base = path_offset[s]
        probs = rng.dirichlet(np.ones(k) * 2.0)
        choice = rng.choice(k, H, p=probs)
        for p in range(k):
            cols = np.nonzero(choice == p)[0]
            M[2 * (base + p), cols] = True
            M[2 * (base + p) + 1, cols] = True

    Pmax = 4
    idx = np.full((n_snarls, Pmax), -1, np.int32)
    for s in range(n_snarls):
        k = n_paths_per_snarl[s]
        idx[s, :k] = np.arange(path_offset[s], path_offset[s] + k)

    pheno_bin = rng.integers(0, 2, n_samples).astype(np.float32)
    pheno_q = rng.standard_normal(n_samples)
    return dict(M=M, coo_path=coo_path.astype(np.int32),
                coo_row=coo_row.astype(np.int32), n_edges=n_edges,
                valid=valid, idx=idx, pheno_bin=pheno_bin, pheno_q=pheno_q,
                n_paths_per_snarl=n_paths_per_snarl,
                path_offset=path_offset)


def run_device(w, repeats=3):
    from stoat_tpu.pipeline.binary import binary_tables_device
    from stoat_tpu.pipeline.quantitative import quantitative_design_device
    from stoat_tpu.stats.linreg import linear_regression_batch

    num_paths = int(w["n_edges"].shape[0])
    args = (
        jnp.asarray(w["M"], jnp.float32),
        jnp.asarray(w["coo_path"]), jnp.asarray(w["coo_row"]),
        jnp.asarray(w["n_edges"]), jnp.asarray(w["valid"]),
        jnp.asarray(w["idx"]),
    )
    pheno_hap = jnp.asarray(np.repeat(w["pheno_bin"], 2))
    th = (jnp.float64(3), jnp.float64(5), jnp.float64(0.05))
    covar0 = jnp.zeros((N_SAMPLES, 0), jnp.float64)
    pheno_q = jnp.asarray(w["pheno_q"])

    def step_binary():
        return binary_tables_device(*args, pheno_hap, *th,
                                    num_paths=num_paths)

    def step_quant():
        d = quantitative_design_device(*args, covar0, *th,
                                       num_paths=num_paths,
                                       with_covar=False)
        used = d["used"]
        y = pheno_q[None, :] * used
        p, b, se, r2 = linear_regression_batch(d["X"], y, used, d["ncols"])
        return p, b, se, r2, d["filtered"]

    # warmup/compile
    rb = step_binary()
    jax.block_until_ready(rb)
    rq = step_quant()
    jax.block_until_ready(rq)

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        rb = step_binary()
        rq = step_quant()
        jax.block_until_ready((rb, rq))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    snarls_tested = 2 * N_SNARLS  # binary + quantitative per snarl
    return snarls_tested / dt, rb, rq


def run_baseline(w, sample=BASELINE_SAMPLE):
    """Single-core scalar per-snarl loop (reference algorithm, C-backed
    scipy/numpy), extrapolated to the full workload."""
    import scipy.stats

    M = w["M"]
    H = M.shape[1]
    pheno_b = w["pheno_bin"].astype(bool)
    pheno_q = w["pheno_q"]
    off = w["path_offset"]
    t0 = time.perf_counter()
    for s in range(sample):
        k = w["n_paths_per_snarl"][s]
        rows = slice(2 * off[s], 2 * off[s + 1])
        g0 = np.zeros(k)
        g1 = np.zeros(k)
        dos = np.zeros((N_SAMPLES, k))
        for p in range(k):
            r0 = 2 * (off[s] + p)
            cols = np.nonzero(M[r0] & M[r0 + 1])[0]
            for c in cols:
                if pheno_b[c // 2]:
                    g1[p] += 1
                else:
                    g0[p] += 1
                dos[c // 2, p] += 1
        keep = (g0 + g1) > 0
        g0k, g1k = g0[keep], g1[keep]
        # binary tests
        if len(g0k) >= 2 and g0k.sum() and g1k.sum() and np.all(g0k + g1k):
            scipy.stats.chi2_contingency(np.stack([g0k, g1k]),
                                         correction=False)
            if len(g0k) == 2:
                scipy.stats.fisher_exact([[g0k[0], g0k[1]],
                                          [g1k[0], g1k[1]]])
        # quantitative OLS
        used = dos.sum(axis=1) > 0
        d = dos[used][:, keep]
        rs = d.sum(axis=1, keepdims=True)
        d = np.where(d > 0, d / rs, 0.0)[:, :-1]
        if d.shape[1] >= 1 and d.shape[0] > 3:
            X = np.column_stack([np.ones(d.shape[0]), d])
            XtX = X.T @ X
            XtXinv = np.linalg.inv(XtX)
            beta = XtXinv @ (X.T @ pheno_q[used])
            resid = pheno_q[used] - X @ beta
            mse = resid @ resid / max(d.shape[0] - X.shape[1] + 1, 1)
            se = np.sqrt(np.diag(XtXinv) * mse)
            t = beta[1] / se[1]
            2 * scipy.stats.t.sf(abs(t), max(d.shape[0] - X.shape[1] + 1, 1))
    dt = time.perf_counter() - t0
    return 2 * sample / dt


def main():
    rng = np.random.default_rng(SEED)
    w = make_workload(rng)
    device_rate, rb, rq = run_device(w)
    baseline_rate = run_baseline(w)
    print(json.dumps({
        "metric": "snarls_tested_per_s_per_chip",
        "value": round(device_rate, 1),
        "unit": "snarls/s",
        "vs_baseline": round(device_rate / baseline_rate, 2),
    }))


if __name__ == "__main__":
    main()
