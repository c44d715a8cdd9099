"""Sharded analysis dispatch via shard_map over the snarl mesh.

Each device runs the identical batched per-snarl program on its shard;
the matrix/phenotype are replicated, results gather back to host.  Value
parity across mesh shapes is pinned by tests (the reference's multi-thread
nondeterminism does not apply: output order is deterministic here).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

from stoat_tpu import jaxconfig  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stoat_tpu.pipeline.binary import binary_tables_device
from stoat_tpu.stats.chi2 import finish_chi2_pvalues
from stoat_tpu.pipeline.quantitative import quantitative_design_device
from stoat_tpu.stats.linreg import (finish_linear_pvalues,
                                    linear_regression_stats_batch)
from stoat_tpu.stats.logreg import logistic_regression_batch
from stoat_tpu.parallel.mesh import ShardedChromosome

__all__ = ["binary_analyze_sharded", "quantitative_analyze_sharded",
           "lmm_analyze_sharded",
           "binary_covar_analyze_sharded"]


def binary_analyze_sharded(sharded: ShardedChromosome,
                           binary_phenotype: np.ndarray,
                           mesh: Mesh,
                           min_individuals: int, min_haplotypes: int,
                           maf_threshold: float) -> Dict[str, np.ndarray]:
    """Run the binary pipeline with snarls sharded over ``mesh``.

    Equivalent results to the single-device path; the leading shard axis of
    every input lives on a different device.
    """
    pheno_hap = np.repeat(binary_phenotype.astype(np.float32), 2)
    num_paths = sharded.paths_per_shard

    shard = NamedSharding(mesh, P("snarls"))
    repl = NamedSharding(mesh, P())

    def local_fn(matrix, coo_path, coo_row, n_edges, valid, idx, pheno,
                 min_ind, min_hap, maf):
        # each arg's leading shard axis is 1 inside the shard body;
        # tails=False keeps the igammac chi2 tail *outside* the shard
        # (it compiles pathologically slowly under manual partitioning)
        out = binary_tables_device(
            matrix, coo_path[0], coo_row[0], n_edges[0], valid[0], idx[0],
            pheno, min_ind, min_hap, maf, num_paths=num_paths, tails=False)
        return {k: v[None] for k, v in out.items()}

    fn = jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P("snarls"), P("snarls"), P("snarls"), P("snarls"),
                  P("snarls"), P(), P(), P(), P()),
        out_specs=P("snarls"),
    ))

    out = fn(
        jax.device_put(jnp.asarray(sharded.matrix, jnp.float32), repl),
        jax.device_put(jnp.asarray(sharded.coo_path), shard),
        jax.device_put(jnp.asarray(sharded.coo_row), shard),
        jax.device_put(jnp.asarray(sharded.n_edges_per_path), shard),
        jax.device_put(jnp.asarray(sharded.path_valid), shard),
        jax.device_put(jnp.asarray(sharded.snarl_path_idx), shard),
        jax.device_put(jnp.asarray(pheno_hap), repl),
        jnp.float64(min_individuals),
        jnp.float64(min_haplotypes),
        jnp.float64(maf_threshold),
    )

    # Unshard BEFORE evaluating the chi2 tail: gammaincc compiles
    # pathologically slowly when its inputs are partitioned arrays (GSPMD),
    # just as inside shard_map.  On gathered host arrays it is instant.
    result = _unshard(out, sharded.shard_sizes)
    result["p_chi2"] = np.asarray(finish_chi2_pvalues(
        jnp.asarray(result.pop("chi2_stat")),
        jnp.asarray(result.pop("chi2_df")),
        jnp.asarray(result.pop("chi2_invalid")),
        jnp.asarray(result.pop("chi2_zexp"))))
    return result


def _unshard(out: Dict[str, jnp.ndarray],
             sizes) -> Dict[str, np.ndarray]:
    """Flatten [D, S_local, ...] back to global snarl order, dropping
    per-shard padding."""
    result: Dict[str, np.ndarray] = {}
    for key, value in out.items():
        arr = np.asarray(value)
        parts = [arr[d, :sizes[d]] for d in range(len(sizes))]
        result[key] = np.concatenate(parts, axis=0)
    return result


def quantitative_analyze_sharded(sharded: ShardedChromosome,
                                 phenotype: np.ndarray,
                                 covar, mesh: Mesh,
                                 min_individuals: int, min_haplotypes: int,
                                 maf_threshold: float) -> Dict[str, np.ndarray]:
    """Snarl-sharded quantitative OLS: design assembly + regression run
    per shard, phenotype/covariates replicated."""
    num_paths = sharded.paths_per_shard
    n_samples = sharded.matrix.shape[1] // 2
    C = 0 if covar is None else covar.shape[1]
    covar_in = np.zeros((n_samples, 0)) if covar is None else covar
    with_covar = C > 0

    shard = NamedSharding(mesh, P("snarls"))
    repl = NamedSharding(mesh, P())

    def local_fn(matrix, coo_path, coo_row, n_edges, valid, idx, covar_d,
                 pheno, min_ind, min_hap, maf):
        d = quantitative_design_device(
            matrix, coo_path[0], coo_row[0], n_edges[0], valid[0], idx[0],
            covar_d, min_ind, min_hap, maf, num_paths=num_paths,
            with_covar=with_covar)
        used = d["used"]
        y = pheno[None, :] * used
        t1, df_res, beta, se, r2 = linear_regression_stats_batch(
            d["X"], y, used, d["ncols"])
        nan = jnp.nan
        deg = d["degenerate"]
        out = {
            "filtered": d["filtered"],
            "allele_paths": d["allele_paths"],
            "t1": t1,
            "df_res": df_res,
            "degenerate": deg,
            "beta": jnp.where(deg, nan, beta),
            "se": jnp.where(deg, nan, se),
            "r2": jnp.where(deg, nan, r2),
        }
        return {k: v[None] for k, v in out.items()}

    fn = jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P("snarls"), P("snarls"), P("snarls"), P("snarls"),
                  P("snarls"), P(), P(), P(), P(), P()),
        out_specs=P("snarls"),
    ))

    out = fn(
        jax.device_put(jnp.asarray(sharded.matrix, jnp.float32), repl),
        jax.device_put(jnp.asarray(sharded.coo_path), shard),
        jax.device_put(jnp.asarray(sharded.coo_row), shard),
        jax.device_put(jnp.asarray(sharded.n_edges_per_path), shard),
        jax.device_put(jnp.asarray(sharded.path_valid), shard),
        jax.device_put(jnp.asarray(sharded.snarl_path_idx), shard),
        jax.device_put(jnp.asarray(covar_in, jnp.float64), repl),
        jax.device_put(jnp.asarray(phenotype, jnp.float64), repl),
        jnp.float64(min_individuals),
        jnp.float64(min_haplotypes),
        jnp.float64(maf_threshold),
    )
    return _finish_linear_sharded(out, sharded)


def _finish_linear_sharded(out, sharded):
    """Gather shards to host, then evaluate the t-tail unpartitioned.

    betainc (like gammaincc) must run neither inside shard_map nor on
    partitioned arrays — both make XLA's partitioner unroll its inner
    loop into a minutes-long compile."""
    result = _unshard(out, sharded.shard_sizes)
    p = finish_linear_pvalues(jnp.asarray(result.pop("t1")),
                              jnp.asarray(result.pop("df_res")))
    deg = jnp.asarray(result.pop("degenerate"))
    result["p"] = np.asarray(jnp.where(deg, jnp.nan, p))
    return result


def lmm_analyze_sharded(sharded: ShardedChromosome,
                        lmm_ctx, covar, mesh: Mesh,
                        min_individuals: int, min_haplotypes: int,
                        maf_threshold: float) -> Dict[str, np.ndarray]:
    """Snarl-sharded kinship LMM: EMMAX designs per shard, rotation and
    rotated phenotype replicated (stats/lmm.py).  The rotation einsum and
    the rotated-OLS solve both run inside the shard."""
    num_paths = sharded.paths_per_shard
    n_samples = sharded.matrix.shape[1] // 2
    C = 0 if covar is None else covar.shape[1]
    covar_in = np.zeros((n_samples, 0)) if covar is None else covar
    with_covar = C > 0

    shard = NamedSharding(mesh, P("snarls"))
    repl = NamedSharding(mesh, P())

    def local_fn(matrix, coo_path, coo_row, n_edges, valid, idx, covar_d,
                 rot, y_rot, min_ind, min_hap, maf):
        d = quantitative_design_device(
            matrix, coo_path[0], coo_row[0], n_edges[0], valid[0], idx[0],
            covar_d, min_ind, min_hap, maf, num_paths=num_paths,
            with_covar=with_covar, all_rows=True)
        Xr = jnp.einsum("mn,snp->smp", rot, d["X"])
        S_, N = Xr.shape[0], Xr.shape[1]
        yr = jnp.broadcast_to(y_rot[None, :], (S_, N))
        mask = jnp.ones((S_, N), bool)
        t1, df_res, beta, se, r2 = linear_regression_stats_batch(
            Xr, yr, mask, d["ncols"])
        nan = jnp.nan
        deg = d["degenerate"]
        out = {
            "filtered": d["filtered"],
            "allele_paths": d["allele_paths"],
            "t1": t1,
            "df_res": df_res,
            "degenerate": deg,
            "beta": jnp.where(deg, nan, beta),
            "se": jnp.where(deg, nan, se),
            "r2": jnp.where(deg, nan, r2),
        }
        return {k: v[None] for k, v in out.items()}

    fn = jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P("snarls"), P("snarls"), P("snarls"), P("snarls"),
                  P("snarls"), P(), P(), P(), P(), P(), P()),
        out_specs=P("snarls"),
    ))

    out = fn(
        jax.device_put(jnp.asarray(sharded.matrix, jnp.float32), repl),
        jax.device_put(jnp.asarray(sharded.coo_path), shard),
        jax.device_put(jnp.asarray(sharded.coo_row), shard),
        jax.device_put(jnp.asarray(sharded.n_edges_per_path), shard),
        jax.device_put(jnp.asarray(sharded.path_valid), shard),
        jax.device_put(jnp.asarray(sharded.snarl_path_idx), shard),
        jax.device_put(jnp.asarray(covar_in, jnp.float64), repl),
        jax.device_put(jnp.asarray(lmm_ctx.rot, jnp.float64), repl),
        jax.device_put(jnp.asarray(lmm_ctx.y_rot, jnp.float64), repl),
        jnp.float64(min_individuals),
        jnp.float64(min_haplotypes),
        jnp.float64(maf_threshold),
    )
    return _finish_linear_sharded(out, sharded)


def binary_covar_analyze_sharded(sharded: ShardedChromosome,
                                 binary_phenotype: np.ndarray,
                                 mesh: Mesh,
                                 min_individuals: int, min_haplotypes: int,
                                 maf_threshold: float) -> Dict[str, np.ndarray]:
    """Snarl-sharded IRLS logistic regression (covariates excluded from
    the design, as in the reference — see stats.logreg)."""
    num_paths = sharded.paths_per_shard
    n_samples = sharded.matrix.shape[1] // 2
    covar_in = np.zeros((n_samples, 0))

    shard = NamedSharding(mesh, P("snarls"))
    repl = NamedSharding(mesh, P())

    def local_fn(matrix, coo_path, coo_row, n_edges, valid, idx, covar_d,
                 pheno, min_ind, min_hap, maf):
        d = quantitative_design_device(
            matrix, coo_path[0], coo_row[0], n_edges[0], valid[0], idx[0],
            covar_d, min_ind, min_hap, maf, num_paths=num_paths,
            with_covar=False)
        used = d["used"]
        y = pheno[None, :] * used
        p, beta, se = logistic_regression_batch(d["X"], y, used, d["ncols"])
        nan = jnp.nan
        deg = d["degenerate"]
        out = {
            "filtered": d["filtered"],
            "allele_paths": d["allele_paths"],
            "p": jnp.where(deg, nan, p),
            "beta": jnp.where(deg, nan, beta),
            "se": jnp.where(deg, nan, se),
        }
        return {k: v[None] for k, v in out.items()}

    fn = jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P("snarls"), P("snarls"), P("snarls"), P("snarls"),
                  P("snarls"), P(), P(), P(), P(), P()),
        out_specs=P("snarls"),
    ))

    out = fn(
        jax.device_put(jnp.asarray(sharded.matrix, jnp.float32), repl),
        jax.device_put(jnp.asarray(sharded.coo_path), shard),
        jax.device_put(jnp.asarray(sharded.coo_row), shard),
        jax.device_put(jnp.asarray(sharded.n_edges_per_path), shard),
        jax.device_put(jnp.asarray(sharded.path_valid), shard),
        jax.device_put(jnp.asarray(sharded.snarl_path_idx), shard),
        jax.device_put(jnp.asarray(covar_in, jnp.float64), repl),
        jax.device_put(jnp.asarray(binary_phenotype.astype(np.float64)),
                       repl),
        jnp.float64(min_individuals),
        jnp.float64(min_haplotypes),
        jnp.float64(maf_threshold),
    )
    return _unshard(out, sharded.shard_sizes)
