#!/usr/bin/env python
"""Phase-level profile of the full-run metric (temp tool, not shipped)."""
import os, sys, time, tempfile
import numpy as np
import stoat_tpu.jaxconfig  # noqa
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench
from bench import N_SAMPLES, make_vcf_workload, _settle

def main():
    rng = np.random.default_rng(42)
    tmpdir = tempfile.mkdtemp(prefix="stoat_proff_")
    os.makedirs(os.path.join(tmpdir, "full"), exist_ok=True)
    paths = make_vcf_workload(os.path.join(tmpdir, "full"), rng)
    from stoat_tpu.io.phenotype import parse_binary_pheno, parse_quantitative_pheno
    from stoat_tpu.io.snarl_file import parse_snarl_path
    pheno_bin, samples = parse_binary_pheno(paths["binary"], list(paths["samples"]))
    pheno_q = parse_quantitative_pheno(paths["quantitative"], samples)
    snarls_chr = parse_snarl_path(paths["snarl"])
    from stoat_tpu.pipeline.runner import run_vcf_analysis
    out_b = os.path.join(tmpdir, "b.tsv"); out_q = os.path.join(tmpdir, "q.tsv")

    def bin_run():
        run_vcf_analysis(paths["vcf"], snarls_chr, out_b, "binary",
                         binary_phenotype=pheno_bin, sample_names=samples,
                         use_mesh=False, snarl_chunk_size=16384)
    def quant_run():
        run_vcf_analysis(paths["vcf"], snarls_chr, out_q, "quantitative",
                         quantitative_phenotype=pheno_q, sample_names=samples,
                         use_mesh=False, snarl_chunk_size=16384)
    def dual_run():
        run_vcf_analysis(paths["vcf"], snarls_chr, out_b, "binary",
                         binary_phenotype=pheno_bin, sample_names=samples,
                         use_mesh=False, snarl_chunk_size=16384,
                         secondary={"mode": "quantitative", "output_tsv": out_q,
                                    "quantitative_phenotype": pheno_q})
    bin_run(); quant_run(); dual_run()   # warm
    for rep in range(3):
        _settle()
        t0 = time.perf_counter(); bin_run(); tb = time.perf_counter() - t0
        _settle()
        t0 = time.perf_counter(); quant_run(); tq = time.perf_counter() - t0
        _settle()
        t0 = time.perf_counter(); dual_run(); td = time.perf_counter() - t0
        print(f"rep{rep}: bin={tb*1e3:.0f}ms quant={tq*1e3:.0f}ms "
              f"full={1e3*(tb+tq):.0f}ms dual={td*1e3:.0f}ms")

if __name__ == "__main__":
    main()
