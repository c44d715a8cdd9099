"""Sharded analysis dispatch via shard_map over the snarl mesh.

Each device runs the identical batched per-snarl program on its shard:
the bit-packed edge-word matrix (uint32, 32 haplotypes/word — see
pipeline/packed.py) and phenotype masks are replicated, the per-snarl
path tables are sharded on the leading axis, and results gather back to
host.  Value parity across mesh shapes is pinned by tests (the
reference's multi-thread nondeterminism does not apply: output order is
deterministic here).

Special-function tails (igammac for chi², betainc for the t-test) are
finished OUTSIDE the shard on gathered host arrays: XLA's manual
partitioner unrolls their inner loops into minutes-long compiles when
the inputs are partitioned.
"""

from __future__ import annotations

from typing import Dict

from stoat_tpu import jaxconfig  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stoat_tpu.pipeline.binary import binary_tables_device_packed
from stoat_tpu.pipeline import packed as _pk
from stoat_tpu.stats.chi2 import finish_chi2_pvalues
from stoat_tpu.pipeline.quantitative import quantitative_design_packed
from stoat_tpu.stats.linreg import (finish_linear_pvalues,
                                    linear_regression_stats_batch)
from stoat_tpu.stats.logreg import logistic_regression_batch
from stoat_tpu.parallel.mesh import ShardedChromosome

__all__ = ["binary_analyze_sharded", "quantitative_analyze_sharded",
           "lmm_analyze_sharded", "binary_covar_analyze_sharded",
           "eqtl_regress_pairs_sharded", "dual_analyze_sharded",
           "binary_perm_pvalues_sharded", "quant_perm_pvalues_sharded",
           "logistic_score_perm_sharded", "ShardedPermState"]

# Design outputs forwarded to the writer when -T table dumps are on.
_TABLE_KEYS = ("norm", "used", "kept")


def binary_analyze_sharded(sharded: ShardedChromosome,
                           binary_phenotype: np.ndarray,
                           mesh: Mesh,
                           min_individuals: int, min_haplotypes: int,
                           maf_threshold: float) -> Dict[str, np.ndarray]:
    """Run the binary pipeline with snarls sharded over ``mesh``.

    Equivalent results to the single-device path; the leading shard axis of
    every per-snarl input lives on a different device, the packed word
    matrix and phenotype masks are replicated.
    """
    W = sharded.words.shape[1]
    tail = _pk.tail_mask_words(sharded.n_haps, W)
    g1_words = _pk.pack_hap_mask_words(
        np.repeat(binary_phenotype.astype(bool), 2), W)

    shard = NamedSharding(mesh, P("snarls"))
    repl = NamedSharding(mesh, P())

    def local_fn(words, path_idx, valid, tail_a, g1_a, idx,
                 min_ind, min_hap, maf):
        # tails=False keeps the igammac chi2 tail *outside* the shard
        # (it compiles pathologically slowly under manual partitioning)
        out = binary_tables_device_packed(
            words, path_idx[0], valid[0], tail_a, g1_a, idx[0],
            min_ind, min_hap, maf, tails=False)
        return {k: v[None] for k, v in out.items()}

    fn = jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P("snarls"), P("snarls"), P(), P(), P("snarls"),
                  P(), P(), P()),
        out_specs=P("snarls"),
    ))

    out = fn(
        jax.device_put(jnp.asarray(sharded.words), repl),
        jax.device_put(jnp.asarray(sharded.path_idx), shard),
        jax.device_put(jnp.asarray(sharded.path_valid), shard),
        jax.device_put(jnp.asarray(tail), repl),
        jax.device_put(jnp.asarray(g1_words), repl),
        jax.device_put(jnp.asarray(sharded.snarl_path_idx), shard),
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


def dual_analyze_sharded(sharded: ShardedChromosome,
                         binary_phenotype: np.ndarray,
                         quantitative_phenotype: np.ndarray,
                         mesh: Mesh,
                         min_individuals: int, min_haplotypes: int,
                         maf_threshold: float,
                         covariate=None) -> Dict[str, np.ndarray]:
    """Fused dual-phenotype (binary chi²/Fisher + quantitative OLS)
    with snarls sharded over ``mesh`` — the multi-chip extension of the
    runner's `-b -q` single-pass program (_fused_dual_analysis): one
    shard_map computes the shared packed membership once per shard and
    both result sets; the chi² igammac and OLS betainc tails finish
    OUTSIDE the shard on gathered arrays (see module docstring).
    Quantitative keys carry the ``q_`` prefix."""
    from stoat_tpu.pipeline.quantitative import _fused_dual_body

    W = sharded.words.shape[1]
    tail = _pk.tail_mask_words(sharded.n_haps, W)
    g1_words = _pk.pack_hap_mask_words(
        np.repeat(binary_phenotype.astype(bool), 2), W)
    n_samples = sharded.n_haps // 2
    covar0 = (np.zeros((n_samples, 0)) if covariate is None
              else np.asarray(covariate, np.float64))
    with_covar = covar0.shape[1] > 0

    shard = NamedSharding(mesh, P("snarls"))
    repl = NamedSharding(mesh, P())

    def local_fn(words, path_idx, valid, idx, tail_a, g1_a, covar,
                 pheno_q, min_ind, min_hap, maf):
        out = _fused_dual_body(
            words, path_idx[0], valid[0], idx[0], tail_a, g1_a, covar,
            pheno_q, min_ind, min_hap, maf,
            n_haplotypes=sharded.n_haps, tails=False,
            with_covar=with_covar)
        return {k: v[None] for k, v in out.items()}

    fn = jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P("snarls"), P("snarls"), P("snarls"), P(), P(),
                  P(), P(), P(), P(), P()),
        out_specs=P("snarls"),
    ))

    out = fn(
        jax.device_put(jnp.asarray(sharded.words), repl),
        jax.device_put(jnp.asarray(sharded.path_idx), shard),
        jax.device_put(jnp.asarray(sharded.path_valid), shard),
        jax.device_put(jnp.asarray(sharded.snarl_path_idx), shard),
        jax.device_put(jnp.asarray(tail), repl),
        jax.device_put(jnp.asarray(g1_words), repl),
        jax.device_put(jnp.asarray(covar0, jnp.float64), repl),
        jax.device_put(jnp.asarray(quantitative_phenotype, jnp.float64),
                       repl),
        jnp.float64(min_individuals),
        jnp.float64(min_haplotypes),
        jnp.float64(maf_threshold),
    )

    result = _unshard(out, sharded.shard_sizes)
    result["p_chi2"] = np.asarray(finish_chi2_pvalues(
        jnp.asarray(result.pop("chi2_stat")),
        jnp.asarray(result.pop("chi2_df")),
        jnp.asarray(result.pop("chi2_invalid")),
        jnp.asarray(result.pop("chi2_zexp"))))
    q_p = np.array(finish_linear_pvalues(
        jnp.asarray(result.pop("q_t1")),
        jnp.asarray(result.pop("q_df_res"))))
    q_p[result.pop("q_deg").astype(bool)] = np.nan
    result["q_p"] = q_p
    return result


def _unshard(out: Dict[str, jnp.ndarray],
             sizes) -> Dict[str, np.ndarray]:
    """Flatten [D, S_local, ...] back to global snarl order, dropping
    per-shard padding."""
    for value in out.values():
        copy_async = getattr(value, "copy_to_host_async", None)
        if copy_async is not None:
            copy_async()        # overlap all device->host transfers
    result: Dict[str, np.ndarray] = {}
    for key, value in out.items():
        arr = np.asarray(value)
        parts = [arr[d, :sizes[d]] for d in range(len(sizes))]
        result[key] = np.concatenate(parts, axis=0)
    return result


def _design_inputs(sharded: ShardedChromosome, covar, mesh: Mesh):
    """(args, specs) for the replicated words + sharded path tables."""
    n_samples = sharded.n_haps // 2
    covar_in = np.zeros((n_samples, 0)) if covar is None else covar
    shard = NamedSharding(mesh, P("snarls"))
    repl = NamedSharding(mesh, P())
    args = (
        jax.device_put(jnp.asarray(sharded.words), repl),
        jax.device_put(jnp.asarray(sharded.path_idx), shard),
        jax.device_put(jnp.asarray(sharded.path_valid), shard),
        jax.device_put(jnp.asarray(sharded.snarl_path_idx), shard),
        jax.device_put(jnp.asarray(covar_in, jnp.float64), repl),
    )
    specs = (P(), P("snarls"), P("snarls"), P("snarls"), P())
    return args, specs, covar_in


def quantitative_analyze_sharded(sharded: ShardedChromosome,
                                 phenotype: np.ndarray,
                                 covar, mesh: Mesh,
                                 min_individuals: int, min_haplotypes: int,
                                 maf_threshold: float,
                                 return_tables: bool = False
                                 ) -> Dict[str, np.ndarray]:
    """Snarl-sharded quantitative OLS: design assembly + regression run
    per shard, phenotype/covariates replicated.  ``return_tables`` adds
    the per-sample ``norm``/``used``/``kept`` arrays for -T dumps."""
    n_haps = sharded.n_haps
    with_covar = covar is not None and covar.shape[1] > 0
    args, specs, _ = _design_inputs(sharded, covar, mesh)
    repl = NamedSharding(mesh, P())

    def local_fn(words, path_idx, valid, idx, covar_d,
                 pheno, min_ind, min_hap, maf):
        d = quantitative_design_packed(
            words, path_idx[0], valid[0], idx[0], covar_d, min_ind,
            min_hap, maf, n_haplotypes=n_haps, with_covar=with_covar)
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
        if return_tables:
            out.update({k: d[k] for k in _TABLE_KEYS})
        return {k: v[None] for k, v in out.items()}

    fn = jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(*specs, P(), P(), P(), P()),
        out_specs=P("snarls"),
    ))
    out = fn(
        *args,
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
                        maf_threshold: float,
                        return_tables: bool = False
                        ) -> Dict[str, np.ndarray]:
    """Snarl-sharded kinship LMM: EMMAX designs per shard, rotation and
    rotated phenotype replicated (stats/lmm.py).  The rotation einsum and
    the rotated-OLS solve both run inside the shard."""
    n_haps = sharded.n_haps
    with_covar = covar is not None and covar.shape[1] > 0
    args, specs, _ = _design_inputs(sharded, covar, mesh)
    repl = NamedSharding(mesh, P())

    def local_fn(words, path_idx, valid, idx, covar_d,
                 rot, y_rot, min_ind, min_hap, maf):
        d = quantitative_design_packed(
            words, path_idx[0], valid[0], idx[0], covar_d, min_ind,
            min_hap, maf, n_haplotypes=n_haps, with_covar=with_covar,
            all_rows=True)
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
        if return_tables:
            out.update({k: d[k] for k in _TABLE_KEYS})
        return {k: v[None] for k, v in out.items()}

    fn = jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(*specs, P(), P(), P(), P(), P()),
        out_specs=P("snarls"),
    ))
    out = fn(
        *args,
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
                                 maf_threshold: float,
                                 return_tables: bool = False
                                 ) -> Dict[str, np.ndarray]:
    """Snarl-sharded IRLS logistic regression (covariates excluded from
    the design, as in the reference — see stats.logreg)."""
    n_haps = sharded.n_haps
    args, specs, _ = _design_inputs(sharded, None, mesh)
    repl = NamedSharding(mesh, P())

    def local_fn(words, path_idx, valid, idx, covar_d,
                 pheno, min_ind, min_hap, maf):
        d = quantitative_design_packed(
            words, path_idx[0], valid[0], idx[0], covar_d, min_ind,
            min_hap, maf, n_haplotypes=n_haps, with_covar=False)
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
        if return_tables:
            out.update({k: d[k] for k in _TABLE_KEYS})
        return {k: v[None] for k, v in out.items()}

    fn = jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(*specs, P(), P(), P(), P()),
        out_specs=P("snarls"),
    ))
    out = fn(
        *args,
        jax.device_put(jnp.asarray(binary_phenotype.astype(np.float64)),
                       repl),
        jnp.float64(min_individuals),
        jnp.float64(min_haplotypes),
        jnp.float64(maf_threshold),
    )
    return _unshard(out, sharded.shard_sizes)


class ShardedPermState:
    """Per-chromosome-block device state for the sharded permutation
    kernels: replicated words + sharded path tables uploaded ONCE and
    shared by every job/block, plus lazily-computed permutation-
    invariant stages (per-shard packed membership for the binary
    kernel, the quantitative design, the score-test D/V⁻¹) — each one
    shard_map pass whose outputs stay device-resident and sharded, so
    per-permutation blocks run only the cheap varying math (the
    single-device _ChunkDevice discipline, on the mesh)."""

    def __init__(self, sharded: ShardedChromosome, mesh: Mesh):
        self.sharded = sharded
        self.mesh = mesh
        self.shard = NamedSharding(mesh, P("snarls"))
        self.repl = NamedSharding(mesh, P())
        W = sharded.words.shape[1]
        self.words = jax.device_put(jnp.asarray(sharded.words),
                                    self.repl)
        self.path_idx = jax.device_put(jnp.asarray(sharded.path_idx),
                                       self.shard)
        self.valid = jax.device_put(jnp.asarray(sharded.path_valid),
                                    self.shard)
        self.sidx = jax.device_put(
            jnp.asarray(sharded.snarl_path_idx), self.shard)
        self.tail = jax.device_put(
            jnp.asarray(_pk.tail_mask_words(sharded.n_haps, W)),
            self.repl)
        self._mem = None
        self._design = {}     # (th, covar-key) -> design dict
        self._score = {}      # (th, zw-key) -> (D, used, Vinv, df, bad)

    def membership(self):
        """[D, P_local, W] per-shard packed membership (computed once)."""
        if self._mem is None:
            def local_fn(words, path_idx):
                return _pk.membership_words_body(words, path_idx[0])[None]

            fn = jax.jit(jax.shard_map(
                local_fn, mesh=self.mesh,
                in_specs=(P(), P("snarls")), out_specs=P("snarls")))
            self._mem = fn(self.words, self.path_idx)
        return self._mem

    def design(self, covar, th, with_covar: bool):
        """Per-shard quantitative design (X/used/ncols/bad), once per
        (thresholds, covariates)."""
        key = (th, None if covar is None
               else (covar.shape, covar.tobytes()))
        got = self._design.get(key)
        if got is not None:
            return got
        n_haps = self.sharded.n_haps
        n_samples = n_haps // 2
        covar_in = (np.zeros((n_samples, 0))
                    if covar is None else np.asarray(covar, np.float64))
        covar_d = jax.device_put(jnp.asarray(covar_in, jnp.float64),
                                 self.repl)

        def local_fn(words, path_idx, valid, idx, covar_a,
                     min_ind, min_hap, maf):
            d = quantitative_design_packed(
                words, path_idx[0], valid[0], idx[0], covar_a, min_ind,
                min_hap, maf, n_haplotypes=n_haps,
                with_covar=with_covar)
            out = {"X": d["X"], "used": d["used"], "ncols": d["ncols"],
                   "bad": d["filtered"] | d["degenerate"]}
            return {k: v[None] for k, v in out.items()}

        fn = jax.jit(jax.shard_map(
            local_fn, mesh=self.mesh,
            in_specs=(P(), P("snarls"), P("snarls"), P("snarls"), P(),
                      P(), P(), P()),
            out_specs=P("snarls")))
        got = fn(self.words, self.path_idx, self.valid, self.sidx,
                 covar_d, jnp.float64(th[0]), jnp.float64(th[1]),
                 jnp.float64(th[2]))
        self._design[key] = got
        return got

    def score_pieces(self, Z, w, th):
        """Per-shard covariate-adjusted score-test invariants
        (D, used, V⁻¹, df, allbad), once per (thresholds, reduced fit)."""
        key = (th, Z.shape, Z.tobytes(), w.tobytes())
        got = self._score.get(key)
        if got is not None:
            return got
        from stoat_tpu.pipeline.permutation import _score_test_precompute

        d = self.design(None, th, with_covar=False)
        Zd = jax.device_put(jnp.asarray(Z, jnp.float64), self.repl)
        wd = jax.device_put(jnp.asarray(w, jnp.float64), self.repl)

        def local_fn(X, used, ncols, bad, Z_a, w_a):
            D, Vinv, df, extra_bad = _score_test_precompute(
                X[0], used[0], ncols[0], Z_a, w_a)
            out = {"D": D, "used": used[0], "Vinv": Vinv,
                   "df": jnp.maximum(df, 1.0),
                   "allbad": bad[0] | extra_bad | (df < 1)}
            return {k: v[None] for k, v in out.items()}

        fn = jax.jit(jax.shard_map(
            local_fn, mesh=self.mesh,
            in_specs=(P("snarls"), P("snarls"), P("snarls"),
                      P("snarls"), P(), P()),
            out_specs=P("snarls")))
        got = fn(d["X"], d["used"], d["ncols"], d["bad"], Zd, wd)
        self._score[key] = got
        return got


def _unshard_perm(out: Dict[str, jnp.ndarray], sizes) -> Dict[str,
                                                             np.ndarray]:
    """Gather [D, K, S_local] permutation outputs to [K, S] global snarl
    order (the snarl axis is LAST here, unlike _unshard's row layouts)."""
    for value in out.values():
        copy_async = getattr(value, "copy_to_host_async", None)
        if copy_async is not None:
            copy_async()
    result: Dict[str, np.ndarray] = {}
    for key, value in out.items():
        arr = np.asarray(value)
        parts = [arr[d][:, :sizes[d]] for d in range(len(sizes))]
        result[key] = np.concatenate(parts, axis=1)
    return result


def _sanitize_host(p: np.ndarray, bad: np.ndarray) -> np.ndarray:
    """Host twin of permutation._sanitize_p (clip, bad/non-finite → inf)."""
    p = np.clip(p, 0.0, 1.0)
    p[bad.astype(bool) | ~np.isfinite(p)] = np.inf
    return p


def _perm_blocks(fn, items: np.ndarray, perm_chunk: int,
                 S: int) -> np.ndarray:
    """Shared fixed-size block runner (permutation._batched twin for
    the sharded kernels: pad the last block, trim, concatenate)."""
    from stoat_tpu.pipeline.permutation import _batched

    return _batched(fn, items, perm_chunk, S)


def binary_perm_pvalues_sharded(sharded: ShardedChromosome,
                                masks: np.ndarray, mesh: Mesh,
                                min_individuals: int, min_haplotypes: int,
                                maf_threshold: float,
                                perm_chunk: int = 16,
                                state: "ShardedPermState" = None
                                ) -> np.ndarray:
    """[K, S] asymptotic chi² p-values for K packed phenotype masks with
    SNARLS sharded over ``mesh`` — the multi-chip twin of
    permutation._perm_binary_pvalues.  The per-shard packed membership
    computes ONCE (ShardedPermState, shared across jobs/blocks); every
    mask block rides it replicated, and the igammac chi² tail finishes
    OUTSIDE the shard on gathered arrays (see module docstring).  Value
    parity with the single-device path is pinned by tests."""
    from stoat_tpu.pipeline.binary import _binary_from_path_counts
    from stoat_tpu.stats.special import chi2_sf

    st = state if state is not None else ShardedPermState(sharded, mesh)
    mem = st.membership()
    th = (jnp.float64(min_individuals), jnp.float64(min_haplotypes),
          jnp.float64(maf_threshold))

    def local_fn(mem_a, valid, idx, tail_a, masks_a,
                 min_ind, min_hap, maf):
        def one(mask):
            g0p, g1p = _pk.packed_binary_counts.__wrapped__(
                mem_a[0], valid[0], tail_a, mask)
            out = _binary_from_path_counts(
                g0p, g1p, idx[0], min_ind, min_hap, maf, tails=False)
            bad = (out["filtered"] | out["chi2_invalid"]
                   | out["chi2_zexp"])
            return out["chi2_stat"], out["chi2_df"], bad

        stat, df, bad = jax.vmap(one)(masks_a)
        return {"stat": stat[None], "df": df[None], "bad": bad[None]}

    fn = jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P("snarls"), P("snarls"), P("snarls"), P(), P(),
                  P(), P(), P()),
        out_specs=P("snarls"),
    ))

    def run_block(block):
        out = fn(mem, st.valid, st.sidx, st.tail,
                 jax.device_put(jnp.asarray(block), st.repl), *th)
        got = _unshard_perm(out, sharded.shard_sizes)
        p = np.asarray(chi2_sf(jnp.asarray(got["stat"]),
                               jnp.asarray(got["df"])))
        return _sanitize_host(p, got["bad"])

    return _perm_blocks(run_block, masks, perm_chunk,
                        sum(sharded.shard_sizes))


def quant_perm_pvalues_sharded(sharded: ShardedChromosome,
                               phenos: np.ndarray, covar, mesh: Mesh,
                               min_individuals: int, min_haplotypes: int,
                               maf_threshold: float,
                               perm_chunk: int = 8,
                               state: "ShardedPermState" = None
                               ) -> np.ndarray:
    """[K, S] asymptotic OLS-t p-values for K (Freedman–Lane) permuted
    phenotypes with snarls sharded over ``mesh`` — the multi-chip twin
    of permutation._perm_quant_pvalues.  The phenotype-independent
    design assembles ONCE per shard (ShardedPermState) and stays
    device-resident; the betainc t-tail finishes outside the shard on
    gathered arrays."""
    with_covar = covar is not None and np.asarray(covar).shape[1] > 0
    st = state if state is not None else ShardedPermState(sharded, mesh)
    th = (float(min_individuals), float(min_haplotypes),
          float(maf_threshold))
    d = st.design(covar, th, with_covar)

    def local_fn(X, used, ncols, bad, phenos_a):
        def one(ph):
            y = ph[None, :] * used[0]
            t1, df_res, _b, _se, _r2 = linear_regression_stats_batch(
                X[0], y, used[0], ncols[0])
            return t1, df_res

        t1, df_res = jax.vmap(one)(phenos_a)
        K_, S_ = t1.shape
        return {"t1": t1[None], "df_res": df_res[None],
                "bad": jnp.broadcast_to(bad[0][None, None], (1, K_, S_))}

    fn = jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P("snarls"), P("snarls"), P("snarls"), P("snarls"),
                  P()),
        out_specs=P("snarls"),
    ))

    def run_block(block):
        out = fn(d["X"], d["used"], d["ncols"], d["bad"],
                 jax.device_put(jnp.asarray(block, jnp.float64),
                                st.repl))
        got = _unshard_perm(out, sharded.shard_sizes)
        p = np.asarray(finish_linear_pvalues(jnp.asarray(got["t1"]),
                                             jnp.asarray(got["df_res"])))
        return _sanitize_host(p, got["bad"])

    return _perm_blocks(run_block, np.asarray(phenos, np.float64),
                        perm_chunk, sum(sharded.shard_sizes))


def logistic_score_perm_sharded(sharded: ShardedChromosome,
                                Z: np.ndarray, w: np.ndarray,
                                e_batch: np.ndarray, mesh: Mesh,
                                min_individuals: int, min_haplotypes: int,
                                maf_threshold: float,
                                perm_chunk: int = 8,
                                state: "ShardedPermState" = None
                                ) -> np.ndarray:
    """[K, S] covariate-adjusted logistic score-test p-values with
    snarls sharded over ``mesh`` — the multi-chip twin of
    permutation._perm_score_pvalues (reduced-model residual
    permutation).  The invariants (design, D, V⁻¹) compute once per
    shard via ShardedPermState; per block only the U matmul and the
    chi² tail (outside the shard) run."""
    from stoat_tpu.stats.special import chi2_sf

    st = state if state is not None else ShardedPermState(sharded, mesh)
    th = (float(min_individuals), float(min_haplotypes),
          float(maf_threshold))
    sp = st.score_pieces(np.asarray(Z, np.float64),
                         np.asarray(w, np.float64), th)

    def local_fn(D, used, Vinv, df, allbad, e_a):
        def one(e):
            U = jnp.einsum("snp,sn->sp", D[0], used[0] * e[None, :])
            T = jnp.einsum("sp,spq,sq->s", U, Vinv[0], U)
            return T, df[0], allbad[0] | ~jnp.isfinite(T)

        T, dfk, badk = jax.vmap(one)(e_a)
        return {"T": T[None], "df": dfk[None], "bad": badk[None]}

    fn = jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P("snarls"), P("snarls"), P("snarls"), P("snarls"),
                  P("snarls"), P()),
        out_specs=P("snarls"),
    ))

    def run_block(block):
        out = fn(sp["D"], sp["used"], sp["Vinv"], sp["df"], sp["allbad"],
                 jax.device_put(jnp.asarray(block, jnp.float64),
                                st.repl))
        got = _unshard_perm(out, sharded.shard_sizes)
        p = np.asarray(chi2_sf(jnp.asarray(np.maximum(got["T"], 0.0)),
                               jnp.asarray(got["df"])))
        return _sanitize_host(p, got["bad"])

    return _perm_blocks(run_block, np.asarray(e_batch, np.float64),
                        perm_chunk, sum(sharded.shard_sizes))



def eqtl_regress_pairs_sharded(design, pair_snarl: np.ndarray,
                               expr: np.ndarray,
                               mesh: Mesh) -> Dict[str, np.ndarray]:
    """(snarl, gene)-pair OLS sharded over the mesh.

    The per-chromosome design (single-device arrays from
    ``eqtl_design_for_chromosome``) is gathered per pair on host, the
    pair axis is padded to the mesh size and sharded, and the t-tail is
    finished on the gathered results (see ``_finish_linear_sharded``).
    """
    D = mesh.devices.size
    B = len(pair_snarl)
    per = -(-B // D)
    B_pad = per * D

    ps = np.asarray(pair_snarl)
    X = np.asarray(design["X"])[ps]
    used = np.asarray(design["used"])[ps]
    ncols = np.asarray(design["ncols"])[ps]
    degenerate = np.asarray(design["degenerate"])[ps]
    y = np.asarray(expr, np.float64) * used

    def pad(a):
        widths = [(0, B_pad - B)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, widths)

    pair_mesh = Mesh(mesh.devices.reshape(-1), ("pairs",))
    shard = NamedSharding(pair_mesh, P("pairs"))

    def local_fn(X_a, y_a, used_a, ncols_a, deg_a):
        t1, df_res, beta, se, r2 = linear_regression_stats_batch(
            X_a, y_a, used_a, ncols_a)
        nan = jnp.nan
        return {
            "t1": t1,
            "df_res": df_res,
            "degenerate": deg_a,
            "beta": jnp.where(deg_a, nan, beta),
            "se": jnp.where(deg_a, nan, se),
            "r2": jnp.where(deg_a, nan, r2),
        }

    fn = jax.jit(jax.shard_map(
        local_fn, mesh=pair_mesh,
        in_specs=(P("pairs"), P("pairs"), P("pairs"), P("pairs"),
                  P("pairs")),
        out_specs=P("pairs"),
    ))
    out = fn(
        jax.device_put(jnp.asarray(pad(X)), shard),
        jax.device_put(jnp.asarray(pad(y)), shard),
        jax.device_put(jnp.asarray(pad(used)), shard),
        jax.device_put(jnp.asarray(pad(ncols)), shard),
        jax.device_put(jnp.asarray(pad(degenerate)), shard),
    )
    result = {k: np.asarray(v)[:B] for k, v in out.items()}
    p = finish_linear_pvalues(jnp.asarray(result.pop("t1")),
                              jnp.asarray(result.pop("df_res")))
    deg = jnp.asarray(result.pop("degenerate"))
    result["p"] = np.asarray(jnp.where(deg, jnp.nan, p))
    return result
