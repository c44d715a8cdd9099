#!/usr/bin/env python
"""Phase-level profile of bench.py's run_end_to_end (temp tool, not shipped)."""
import os, sys, time, tempfile, threading
import numpy as np
import stoat_tpu.jaxconfig  # noqa
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
import bench
from bench import (N_SAMPLES, N_SNARLS, make_vcf_workload, _Tokenizer,
                   _settle)

def main():
    rng = np.random.default_rng(42)
    tmpdir = tempfile.mkdtemp(prefix="stoat_prof_")
    os.makedirs(os.path.join(tmpdir, "one"), exist_ok=True)
    paths = make_vcf_workload(os.path.join(tmpdir, "one"), rng, n_chroms=1)
    from stoat_tpu.io.phenotype import parse_binary_pheno, parse_quantitative_pheno
    from stoat_tpu.io.snarl_file import parse_snarl_path
    pheno_bin, samples = parse_binary_pheno(paths["binary"], list(paths["samples"]))
    pheno_q = parse_quantitative_pheno(paths["quantitative"], samples)
    snarls_chr = parse_snarl_path(paths["snarl"])

    from stoat_tpu.pipeline import packed as _pk
    from stoat_tpu.pipeline.fetch import flatten_result
    from stoat_tpu.pipeline.quantitative import _fused_dual_analysis
    from stoat_tpu.pipeline.runner import iter_chromosome_matrices, assemble_words_device
    from stoat_tpu.tables import pack_chromosome_chunks

    chrom0 = next(iter(snarls_chr))
    snarls = snarls_chr[chrom0]
    th = (jnp.float64(3), jnp.float64(5), jnp.float64(0.05))
    covar0 = jnp.zeros((N_SAMPLES, 0), jnp.float64)
    pheno_qd = jnp.asarray(pheno_q, jnp.float64)
    chunk = 8192

    for rep in range(4):
        _settle()
        T = {}
        t_start = time.perf_counter()
        tok = _Tokenizer(snarls_chr)
        gen = iter_chromosome_matrices(paths["vcf"], 2 * N_SAMPLES,
                                       snarls_chr, stream_device_words=True)
        chrom, matrix = next(gen)
        gen.close()
        T["ingest"] = time.perf_counter() - t_start
        t0 = time.perf_counter()
        words = assemble_words_device(matrix)
        T["assemble"] = time.perf_counter() - t0
        W = int(words.shape[1])
        n_hap = 2 * N_SAMPLES
        tail = jnp.asarray(_pk.tail_mask_words(n_hap, W))
        g1_words = jnp.asarray(_pk.pack_hap_mask_words(
            np.repeat(pheno_bin.astype(bool), 2), W))
        results = []
        t0 = time.perf_counter()
        pack_times, upload_times, dispatch_times, flat_times = [], [], [], []
        tp = time.perf_counter()
        for packed in pack_chromosome_chunks(snarls, matrix, chunk,
                                             quad_cache=tok.get(chrom)):
            pack_times.append(time.perf_counter() - tp)
            t1 = time.perf_counter()
            idx = _pk.upload_path_idx(packed.path_edge_idx(),
                                      int(words.shape[0]) - 1)
            pv = jnp.asarray(packed.path_valid)
            sx = _pk.upload_snarl_path_idx(packed.snarl_path_idx)
            t2 = time.perf_counter()
            out = _fused_dual_analysis(
                words, idx, pv, sx, tail,
                g1_words, covar0, pheno_qd, *th, n_haplotypes=n_hap)
            t3 = time.perf_counter()
            results.append(flatten_result(out))
            t4 = time.perf_counter()
            upload_times.append(t2 - t1)
            dispatch_times.append(t3 - t2)
            flat_times.append(t4 - t3)
            tp = time.perf_counter()
        T["chunk_loop"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        for fr in results:
            fr["p_chi2"], fr["q_p"]
        T["materialize"] = time.perf_counter() - t0
        T["total"] = time.perf_counter() - t_start
        # byte accounting
        nb_words = matrix.words.nbytes
        print(f"rep{rep}: total={T['total']*1e3:.0f}ms ingest={T['ingest']*1e3:.0f} "
              f"assemble={T['assemble']*1e3:.0f} chunkloop={T['chunk_loop']*1e3:.0f} "
              f"mat={T['materialize']*1e3:.0f}")
        print(f"   pack={[f'{x*1e3:.0f}' for x in pack_times]} "
              f"upload={[f'{x*1e3:.0f}' for x in upload_times]} "
              f"dispatch={[f'{x*1e3:.0f}' for x in dispatch_times]} "
              f"flat={[f'{x*1e3:.0f}' for x in flat_times]}")
        if rep == 0:
            print(f"   words bytes={nb_words} rows={matrix.words.shape}")

if __name__ == "__main__":
    main()
