"""Synthetic GWAS fixture generator: snarl file + VCF + phenotypes.

Builds a deterministic pangenome-shaped dataset: a chain of snarls per
chromosome, each snarl a bubble with 2-4 allele paths; the VCF carries one
record per top-level snarl with INFO ``AT`` allele traversals, exactly the
shape the reference consumes (snarl_analyzer.cpp:190-260).
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

# diploid GT strings for small allele counts (allele index < 8)
_GT_LUT = [[f"{a}/{b}" for b in range(8)] for a in range(8)]


def make_fixture(tmpdir: str, n_samples: int = 40, n_snarls: int = 12,
                 seed: int = 7, chrom: str = "ref",
                 n_chroms: int = 1) -> Dict[str, str]:
    """Write snarl file, VCF, phenotype, covariate files; return paths.

    ``n_chroms > 1`` splits the ``n_snarls`` evenly over chromosomes
    ``{chrom}0..{chrom}N-1`` (the realistic GWAS shape; exercises the
    runner's per-chromosome pipelining)."""
    rng = np.random.default_rng(seed)
    os.makedirs(tmpdir, exist_ok=True)

    samples = [f"samp{i}" for i in range(n_samples)]

    chroms = ([chrom] if n_chroms <= 1
              else [f"{chrom}{c}" for c in range(n_chroms)])
    per_chrom = -(-n_snarls // len(chroms))

    # --- snarl chain: snarl k spans nodes base..base+n_alleles+1 ---------
    snarl_rows = []
    vcf_rows = []
    node = 1
    for k in range(n_snarls):
        this_chrom = chroms[k // per_chrom]
        pos = 100 + (k % per_chrom) * 120
        n_alleles = int(rng.integers(2, 5))   # 2-4 paths
        start = node
        end = node + n_alleles + 1
        mids = list(range(node + 1, node + 1 + n_alleles))
        paths = []
        types = []
        for i, mid in enumerate(mids):
            if k % 5 == 3 and i == 0:
                # a deletion path straight across + nested star on another
                paths.append(f">{start}>{end}")
                types.append("0")
            elif k % 5 == 3 and i == 1:
                paths.append(f">{start}>{mid}>0>{mids[-1]}>{end}")
                types.append("1/9")
            else:
                paths.append(f">{start}>{mid}>{end}")
                types.append("1")
        snarl_id = f"{start}_{end}"
        snarl_rows.append("\t".join([
            this_chrom, str(pos), str(pos + 10), str(1000 + k), snarl_id,
            ",".join(paths), ",".join(types), "1", "1"]))

        # --- VCF record: allele index == path index ----------------------
        freqs = rng.dirichlet(np.ones(n_alleles) * 2.0)
        cum = np.cumsum(freqs)
        draws = np.minimum(np.searchsorted(cum, rng.random((n_samples, 2)),
                                           side="right"), n_alleles - 1)
        missing = rng.random(n_samples) < 0.02
        # plain-list iteration + the GT string LUT: ~3x faster than
        # per-pair f-strings over numpy rows (this loop dominates
        # bench-scale workload generation)
        d1 = draws[:, 0].tolist()
        d2 = draws[:, 1].tolist()
        gts = ["./." if m else _GT_LUT[a1][a2]
               for m, a1, a2 in zip(missing.tolist(), d1, d2)]
        alts = ",".join(["T"] * max(n_alleles - 1, 1))
        vcf_rows.append("\t".join([
            this_chrom, str(pos), snarl_id, "A", alts, "99", "PASS",
            f"AT={','.join(paths)};LV=0", "GT"] + gts))

        node = end

    snarl_path = os.path.join(tmpdir, "snarl_analyse.tsv")
    with open(snarl_path, "w") as fh:
        fh.write("CHR\tSTART_POS\tEND_POS\tSNARL_HANDLEGRAPH\tSNARL\tPATHS\t"
                 "TYPE\tREF\tDEPTH\n")
        fh.write("\n".join(snarl_rows) + "\n")

    vcf_path = os.path.join(tmpdir, "test.vcf")
    with open(vcf_path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        for c in chroms:
            fh.write(f"##contig=<ID={c}>\n")
        fh.write('##INFO=<ID=AT,Number=R,Type=String,Description="Allele '
                 'Traversal">\n')
        fh.write('##INFO=<ID=LV,Number=1,Type=Integer,Description="Level">\n')
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                 + "\t".join(samples) + "\n")
        fh.write("\n".join(vcf_rows) + "\n")

    # --- phenotypes ------------------------------------------------------
    binary = rng.integers(1, 3, n_samples)  # 1 control / 2 case
    binary_path = os.path.join(tmpdir, "binary.pheno.tsv")
    with open(binary_path, "w") as fh:
        fh.write("FID\tIID\tPHENO\n")
        for s, b in zip(samples, binary):
            fh.write(f"{s}\t{s}\t{b}\n")

    quant = rng.standard_normal(n_samples) * 2.0 + 5.0
    quant_path = os.path.join(tmpdir, "quant.pheno.tsv")
    with open(quant_path, "w") as fh:
        fh.write("FID\tIID\tPHENO\n")
        for s, q in zip(samples, quant):
            fh.write(f"{s}\t{s}\t{q:.6f}\n")

    covar = rng.standard_normal((n_samples, 2))
    covar_path = os.path.join(tmpdir, "covariate.tsv")
    with open(covar_path, "w") as fh:
        fh.write("FID\tIID\tAGE\tSEX\n")
        for i, s in enumerate(samples):
            fh.write(f"{s}\t{s}\t{covar[i,0]:.6f}\t{covar[i,1]:.6f}\n")

    # --- eQTL: genes along the chromosome --------------------------------
    n_genes = 4
    gene_pos_path = os.path.join(tmpdir, "gene_position.tsv")
    with open(gene_pos_path, "w") as fh:
        fh.write("gene_name\tchr\tstart\tend\n")
        for g in range(n_genes):
            lo = 100 + g * 300
            # genes must reference chromosomes that EXIST in the
            # generated set ('ref0..refN-1' when n_chroms > 1, not the
            # base name): cycle them so multi-chromosome eQTL fixtures
            # actually pair genes with snarls
            gene_chrom = (chrom if n_chroms <= 1
                          else f"{chrom}{g % n_chroms}")
            fh.write(f"gene{g}\t{gene_chrom}\t{lo}\t{lo + 200}\n")
    qtl_path = os.path.join(tmpdir, "qtl.tsv")
    expr = rng.standard_normal((n_genes, n_samples)) + 1.0
    with open(qtl_path, "w") as fh:
        fh.write("gene\t" + "\t".join(samples) + "\n")
        for g in range(n_genes):
            fh.write(f"gene{g}\t" + "\t".join(f"{v:.6f}" for v in expr[g])
                     + "\n")

    return {
        "snarl": snarl_path,
        "vcf": vcf_path,
        "binary": binary_path,
        "quantitative": quant_path,
        "covariate": covar_path,
        "gene_position": gene_pos_path,
        "qtl": qtl_path,
        "samples": samples,
    }
