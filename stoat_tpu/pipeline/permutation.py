"""Permutation testing for binary GWAS (beyond the reference).

Empirical and family-wise-corrected p-values by phenotype permutation —
the classic answer to "are these asymptotic chi² tails trustworthy on
MY cohort?".  The reference cannot offer this (its per-snarl scalar
loop makes K permutations K× the full run); here one extra device
dispatch evaluates a whole batch of permuted phenotypes against the
SAME packed membership (computed once per chunk), so 1,000 permutations
cost roughly 1,000/16 extra dispatches of popcounts + chi² statistics
— the measured device rate is ~1.7M snarl-tests/s/chip.

Method (standard max-T / Westfall-Young):
  * statistic: the Pearson chi² statistic (2×2 or 2×N, the same
    filtration/keep semantics as the asymptotic pipeline,
    pipeline/binary.py); filtered or invalid tables score -inf.
  * permutations: sample labels permuted at the SAMPLE level (diploid
    haplotype pairs move together), one global relabeling per
    permutation reused across every chromosome.
  * per-snarl empirical p:  (1 + #{k : T_k[s] ≥ T_obs[s]}) / (K + 1)
  * family-wise (FWER) p:   (1 + #{k : max_s T_k[s] ≥ T_obs[s]}) / (K+1)
    with the max over ALL tested snarls genome-wide.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from stoat_tpu import jaxconfig  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from stoat_tpu.stats.chi2 import chi2_2x2_stat, chi2_2xn_stat

__all__ = ["binary_permutation_stats", "run_permutation_test",
           "permutation_masks"]


def _stat_from_counts(g0_path, g1_path, snarl_path_idx, min_individuals,
                      min_haplotypes, maf_threshold):
    """Per-snarl chi² statistic from per-path carrier counts, with the
    asymptotic pipeline's exact filtration (binary.py
    _binary_from_path_counts); filtered/invalid → -inf."""
    idx = snarl_path_idx
    col_mask = idx >= 0
    safe_idx = jnp.where(col_mask, idx, 0)
    g0 = jnp.where(col_mask, jnp.take(g0_path, safe_idx), 0.0)
    g1 = jnp.where(col_mask, jnp.take(g1_path, safe_idx), 0.0)
    g0 = g0.astype(jnp.float64)
    g1 = g1.astype(jnp.float64)

    total_sum = jnp.sum(g0 + g1, axis=-1)
    keep = col_mask & ((g0 + g1) != 0)
    k = jnp.sum(keep, axis=-1)
    colsum = g0 + g1
    safe_colsum = jnp.where(colsum == 0, 1.0, colsum)
    freq1 = g1 / safe_colsum
    maf = jnp.minimum(freq1, 1.0 - freq1)
    maf_count = jnp.sum(keep & (maf > maf_threshold), axis=-1)
    filtered = (
        (jnp.floor_divide(total_sum, 2) < min_individuals)
        | (total_sum < min_haplotypes)
        | (k < 2)
        | (maf_count < 2)
    )

    order = jnp.argsort(~keep, axis=-1, stable=True)
    g0s = jnp.take_along_axis(g0, order, axis=-1)
    g1s = jnp.take_along_axis(g1, order, axis=-1)
    stat2, inv2, zexp2 = chi2_2x2_stat(g0s[:, 0], g0s[:, 1],
                                       g1s[:, 0], g1s[:, 1])
    statn, _dfn, invn = chi2_2xn_stat(g0, g1, keep)
    is_2x2 = k == 2
    stat = jnp.where(is_2x2, stat2, statn)
    invalid = jnp.where(is_2x2, inv2 | zexp2, invn)
    return jnp.where(filtered | invalid, -jnp.inf, stat)


@jax.jit
def _perm_chunk_stats(mem_words, path_valid, tail, masks, snarl_path_idx,
                      min_individuals, min_haplotypes, maf_threshold):
    """[K, S] chi² statistics for K packed phenotype masks against one
    chunk's (shared) packed membership."""
    from stoat_tpu.pipeline import packed as _pk

    def one(mask):
        g0p, g1p = _pk.packed_binary_counts.__wrapped__(
            mem_words, path_valid, tail, mask)
        return _stat_from_counts(g0p, g1p, snarl_path_idx,
                                 min_individuals, min_haplotypes,
                                 maf_threshold)

    return jax.vmap(one)(masks)


def permutation_masks(pheno_bin: np.ndarray, n_perms: int, seed: int,
                      n_words: int) -> np.ndarray:
    """[n_perms, W] uint32 packed case masks: sample-level permutations
    of the phenotype (haplotype pairs move together), deterministic in
    ``seed``."""
    from stoat_tpu.pipeline import packed as _pk

    rng = np.random.default_rng(seed)
    pheno = np.asarray(pheno_bin).astype(bool)
    out = np.empty((n_perms, n_words), np.uint32)
    for i in range(n_perms):
        perm = rng.permutation(pheno.shape[0])
        out[i] = _pk.pack_hap_mask_words(np.repeat(pheno[perm], 2),
                                         n_words)
    return out


def binary_permutation_stats(packed, pheno_bin: np.ndarray,
                             masks: np.ndarray,
                             min_individuals, min_haplotypes,
                             maf_threshold, device_matrix=None,
                             perm_chunk: int = 16):
    """(obs_stat [S], perm_stats [K, S]) for one snarl chunk.

    Membership is computed once on device and reused for the observed
    phenotype and every permutation batch."""
    from stoat_tpu.pipeline import packed as _pk

    words = (device_matrix if device_matrix is not None
             else jnp.asarray(packed.packed_words()))
    W = int(words.shape[1])
    idx_dev = _pk.upload_path_idx(packed.path_edge_idx(),
                                  int(words.shape[0]) - 1)
    mem = _pk.membership_words(words, idx_dev)
    valid = jnp.asarray(packed.path_valid)
    sidx = _pk.upload_snarl_path_idx(packed.snarl_path_idx)
    tail = jnp.asarray(_pk.tail_mask_words(packed.n_haplotypes, W))
    th = (jnp.float64(min_individuals), jnp.float64(min_haplotypes),
          jnp.float64(maf_threshold))

    obs_mask = _pk.pack_hap_mask_words(
        np.repeat(np.asarray(pheno_bin).astype(bool), 2), W)
    obs = _perm_chunk_stats(mem, valid, tail,
                            jnp.asarray(obs_mask[None, :]), sidx, *th)[0]

    K = masks.shape[0]
    chunks = []
    for lo in range(0, K, perm_chunk):
        hi = min(K, lo + perm_chunk)
        block = masks[lo:hi]
        if hi - lo < perm_chunk:          # keep one compiled shape
            pad = np.repeat(block[-1:], perm_chunk - (hi - lo), axis=0)
            block = np.concatenate([block, pad], axis=0)
        got = _perm_chunk_stats(mem, valid, tail, jnp.asarray(block),
                                sidx, *th)
        chunks.append(np.asarray(got)[: hi - lo])
    perm = (np.concatenate(chunks, axis=0) if chunks
            else np.zeros((0, obs.shape[0])))
    return np.asarray(obs), perm


@jax.jit
def _perm_quant_stats(X, used, ncols, bad, phenos):
    """[K, S] |t| statistics for K permuted quantitative phenotypes
    against ONE precomputed design (X is phenotype-independent, so the
    expensive design assembly happens once per chunk)."""
    from stoat_tpu.stats.linreg import linear_regression_stats_batch

    def one(ph):
        y = ph[None, :] * used
        t1, _df, _b, _se, _r2 = \
            linear_regression_stats_batch.__wrapped__(X, y, used, ncols)
        return jnp.where(bad, -jnp.inf, jnp.abs(t1))

    return jax.vmap(one)(phenos)


def quantitative_permutation_stats(packed, pheno_q: np.ndarray,
                                   perm_idx: np.ndarray,
                                   min_individuals, min_haplotypes,
                                   maf_threshold, device_matrix=None,
                                   perm_chunk: int = 8):
    """(obs |t| [S], perm |t| [K, S]) for one snarl chunk."""
    from stoat_tpu.pipeline import packed as _pk
    from stoat_tpu.pipeline.quantitative import _design_from_membership

    words = (device_matrix if device_matrix is not None
             else jnp.asarray(packed.packed_words()))
    W = int(words.shape[1])
    idx_dev = _pk.upload_path_idx(packed.path_edge_idx(),
                                  int(words.shape[0]) - 1)
    mem = _pk.membership_words(words, idx_dev)
    membership = _pk.unpack_membership(
        mem, jnp.asarray(packed.path_valid), packed.n_haplotypes)
    covar0 = jnp.zeros((packed.n_haplotypes // 2, 0), jnp.float64)
    d = _design_from_membership(
        membership, _pk.upload_snarl_path_idx(packed.snarl_path_idx),
        covar0, jnp.float64(min_individuals),
        jnp.float64(min_haplotypes), jnp.float64(maf_threshold),
        with_covar=False, all_rows=False)
    X, used, ncols = d["X"], d["used"], d["ncols"]
    bad = d["filtered"] | d["degenerate"]

    ph = np.asarray(pheno_q, np.float64)
    obs = np.asarray(_perm_quant_stats(
        X, used, ncols, bad, jnp.asarray(ph[None, :])))[0]
    K = perm_idx.shape[0]
    chunks = []
    for lo in range(0, K, perm_chunk):
        hi = min(K, lo + perm_chunk)
        block = ph[perm_idx[lo:hi]]
        if hi - lo < perm_chunk:          # keep one compiled shape
            pad = np.repeat(block[-1:], perm_chunk - (hi - lo), axis=0)
            block = np.concatenate([block, pad], axis=0)
        got = _perm_quant_stats(X, used, ncols, bad, jnp.asarray(block))
        chunks.append(np.asarray(got)[: hi - lo])
    perm = (np.concatenate(chunks, axis=0) if chunks
            else np.zeros((0, obs.shape[0])))
    return obs, perm


def permutation_indices(n_samples: int, n_perms: int,
                        seed: int) -> np.ndarray:
    """[n_perms, n_samples] sample-level permutation index matrix,
    deterministic in ``seed`` (the same rng protocol as
    permutation_masks)."""
    rng = np.random.default_rng(seed)
    return np.stack([rng.permutation(n_samples)
                     for _ in range(n_perms)])


def run_permutation_test(vcf_path: str, snarls_chr: Dict[str, List],
                         output_tsv: str,
                         pheno_bin: Optional[np.ndarray] = None,
                         n_perms: int = 1000, seed: int = 0,
                         min_individuals: int = 3,
                         min_haplotypes: int = 5,
                         maf_threshold: float = 0.05,
                         sample_names: Optional[List[str]] = None,
                         snarl_chunk_size: int = 8192,
                         quantitative_phenotype: Optional[np.ndarray]
                         = None) -> int:
    """Genome-wide permutation pass → ``output_tsv`` with per-snarl
    observed statistic (chi² for a binary phenotype, |t| for a
    quantitative one), empirical p, and max-T FWER p.

    Returns the number of tested (non-filtered) snarls."""
    import logging

    from stoat_tpu import writer as Wr
    from stoat_tpu.pipeline.runner import (assemble_words_device,
                                           iter_chromosome_matrices)
    from stoat_tpu.tables import pack_chromosome_chunks

    logger = logging.getLogger("stoat")
    binary = pheno_bin is not None
    if not binary and quantitative_phenotype is None:
        raise ValueError("a binary or quantitative phenotype is required")
    pheno = (np.asarray(pheno_bin) if binary
             else np.asarray(quantitative_phenotype))
    n_hap = 2 * len(pheno)
    masks = None
    perm_idx = (None if binary
                else permutation_indices(len(pheno), n_perms, seed))

    # (chrom, snarl, observed stat, #perms with T_k[s] >= obs[s])
    rows = []
    null_max = np.full(n_perms, -np.inf)

    matrices = iter_chromosome_matrices(vcf_path, n_hap, snarls_chr,
                                        stream_device_words=True)
    for chrom, matrix in matrices:
        if chrom not in snarls_chr:
            continue
        snarls = snarls_chr[chrom]
        device_matrix = assemble_words_device(matrix)
        if binary and masks is None:
            W = int(device_matrix.shape[1])
            masks = permutation_masks(pheno, n_perms, seed, W)
        for packed in pack_chromosome_chunks(snarls, matrix,
                                             snarl_chunk_size):
            if binary:
                obs, perm = binary_permutation_stats(
                    packed, pheno, masks, min_individuals,
                    min_haplotypes, maf_threshold,
                    device_matrix=device_matrix)
            else:
                obs, perm = quantitative_permutation_stats(
                    packed, pheno, perm_idx, min_individuals,
                    min_haplotypes, maf_threshold,
                    device_matrix=device_matrix)
            S = len(packed.snarls)
            obs = obs[:S]
            perm = perm[:, :S]
            exc = np.sum(perm >= obs[None, :], axis=0)
            if S:
                null_max = np.maximum(
                    null_max, perm.max(axis=1, initial=-np.inf))
            rows.extend((chrom, sn, float(obs[i]), int(exc[i]))
                        for i, sn in enumerate(packed.snarls))

    n_tested = 0
    stat_col = "STAT_CHI2" if binary else "STAT_T"
    with open(output_tsv, "w", newline="") as fh:
        fh.write(f"#CHR\tSTART_POS\tEND_POS\tSNARL\t{stat_col}\tP_EMP\t"
                 "P_FWER\n")
        for i, (chrom, sn, obs_s, exc_s) in enumerate(rows):
            if not np.isfinite(obs_s):
                fh.write(f"{chrom}\t{sn.start_pos}\t{sn.end_pos}\t"
                         f"{sn.snarl_id_str}\tNA\tNA\tNA\n")
                continue
            n_tested += 1
            p_emp = (1 + exc_s) / (n_perms + 1)
            p_fwer = (1 + int(np.sum(null_max >= obs_s))) / (n_perms + 1)
            fh.write(f"{chrom}\t{sn.start_pos}\t{sn.end_pos}\t"
                     f"{sn.snarl_id_str}\t{Wr.format_p(obs_s)}\t"
                     f"{Wr.format_p(p_emp)}\t{Wr.format_p(p_fwer)}\n")
    logger.info("Permutation test: %d snarls x %d permutations -> %s",
                n_tested, n_perms, output_tsv)
    return n_tested
