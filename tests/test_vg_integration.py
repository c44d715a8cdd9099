"""vg-in-the-loop integration: real vg-produced artifacts through the
full pipeline (round-4 verdict item 5).

All current parity evidence rides committed fixtures and self-simulated
data; this file closes the loop with artifacts produced by the actual
upstream toolchain — ``vg construct`` builds a graph from FASTA+VCF,
``vg index``/``vg gbwt`` derive the .gbz container exactly as the
reference's own simulation pipeline does
(/root/reference/tests/simu/Snakefile_simulation:14-100).

Gating (CI-optional, image-gated — the dev host has no network and no
vg binary):
  * every test here skips unless a ``vg`` executable is on PATH (the
    Docker image installs the same v1.67.0 release the reference uses,
    Dockerfile:24-27);
  * the reference-binary diff additionally skips unless ``STOAT_BIN``
    points at a built reference ``stoat`` (its vendored deps are
    submodule stubs in this snapshot, so it cannot be built here).

Run inside the image:  pytest tests/test_vg_integration.py -v
"""

import filecmp
import gzip
import os
import shutil
import subprocess

import numpy as np
import pytest

VG = shutil.which("vg")
STOAT_BIN = os.environ.get("STOAT_BIN")

pytestmark = pytest.mark.skipif(VG is None, reason="vg binary not on "
                                "PATH (run inside the Docker image)")

N_SAMPLES = 12


def _run(cmd, **kw):
    return subprocess.run(cmd, check=True, capture_output=True, **kw)


@pytest.fixture(scope="module")
def vg_dataset(tmp_path_factory):
    """FASTA + VCF → vg construct → graph.vg / graph.gfa / graph.gbz /
    graph.dist, plus a deconstructed VCF with AT fields and a binary
    phenotype — the exact artifact set a stoat user brings."""
    tmp = tmp_path_factory.mktemp("vgdata")
    rng = np.random.default_rng(11)
    # reference sequence with 20 well-separated SNP sites
    L = 2000
    bases = np.array(list("ACGT"))
    seq = bases[rng.integers(0, 4, L)]
    sites = np.arange(50, 50 + 20 * 90, 90)
    fasta = tmp / "ref.fa"
    with open(fasta, "w") as fh:
        fh.write(">chr1\n")
        s = "".join(seq)
        for i in range(0, L, 60):
            fh.write(s[i:i + 60] + "\n")
    vcf = tmp / "vars.vcf"
    samples = [f"s{i}" for i in range(N_SAMPLES)]
    with open(vcf, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("##contig=<ID=chr1,length=%d>\n" % L)
        fh.write('##FORMAT=<ID=GT,Number=1,Type=String,'
                 'Description="Genotype">\n')
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
                 "\t" + "\t".join(samples) + "\n")
        for k, pos in enumerate(sites):
            ref = seq[pos - 1]
            alt = bases[(np.flatnonzero(bases == ref)[0] + 1) % 4]
            gts = ["%d|%d" % (rng.random() < 0.5, rng.random() < 0.5)
                   for _ in samples]
            fh.write(f"chr1\t{pos}\tv{k}\t{ref}\t{alt}\t99\tPASS\t.\tGT"
                     "\t" + "\t".join(gts) + "\n")
    _run(["bgzip", "-f", str(vcf)]) if shutil.which("bgzip") else None
    vcf_in = str(vcf) + (".gz" if shutil.which("bgzip") else "")
    if vcf_in.endswith(".gz") and shutil.which("tabix"):
        _run(["tabix", "-p", "vcf", vcf_in])
    # vg construct → .vg, then convert to GFA and GBZ, index .dist
    vg_graph = tmp / "graph.vg"
    with open(vg_graph, "wb") as fh:
        fh.write(_run([VG, "construct", "-r", str(fasta), "-v", vcf_in,
                       "-a"]).stdout)
    gfa = tmp / "graph.gfa"
    with open(gfa, "wb") as fh:
        fh.write(_run([VG, "convert", "-f", str(vg_graph)]).stdout)
    dist = tmp / "graph.dist"
    _run([VG, "index", "-j", str(dist), str(vg_graph)])
    gbz = tmp / "graph.gbz"
    _run([VG, "gbwt", "-G", str(vg_graph), "-v", vcf_in,
          "--gbz-format", "-g", str(gbz)])
    # deconstructed VCF (AT INFO fields) — stoat's actual VCF input
    at_vcf = tmp / "at.vcf"
    with open(at_vcf, "wb") as fh:
        fh.write(_run([VG, "deconstruct", "-a", "-P", "chr1",
                       str(vg_graph)]).stdout)
    pheno = tmp / "pheno.tsv"
    with open(pheno, "w") as fh:
        fh.write("FID\tIID\tPHENO\n")
        for i, s in enumerate(samples):
            fh.write(f"{s}\t{s}\t{1 + i % 2}\n")
    return {"tmp": tmp, "fasta": fasta, "gfa": gfa, "gbz": gbz,
            "dist": dist, "vg": vg_graph, "at_vcf": at_vcf,
            "pheno": pheno, "samples": samples}


def _snarl_key(sid: str) -> str:
    """Orientation-insensitive snarl id (DESIGN.md §7: our ids follow
    the reference path, the reference's follow the .dist index)."""
    a, _, b = sid.partition("_")
    return "_".join(sorted((a, b)))


def _read_keyed(path, key_col=3):
    rows = {}
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "rt") as fh:
        header = fh.readline()
        for line in fh:
            cols = line.rstrip("\n").split("\t")
            rows[_snarl_key(cols[key_col])] = cols
    return header, rows


def test_vg_gfa_decomposition_and_gwas(vg_dataset):
    """vg-produced GFA + deconstruct VCF through decomposition + binary
    GWAS: rows come out, p-values parse, and the GFA/GBZ containers of
    the SAME graph yield identical decompositions (keyed)."""
    from stoat_tpu.graph.decompose import decompose_to_snarl_file
    from stoat_tpu.pipeline.runner import run_vcf_analysis
    from stoat_tpu.io.phenotype import parse_binary_pheno

    d = vg_dataset
    out_gfa = d["tmp"] / "out_gfa"
    out_gbz = d["tmp"] / "out_gbz"
    snarls = decompose_to_snarl_file(str(d["gfa"]), str(d["dist"]),
                                     str(out_gfa), {"chr1"})
    assert sum(len(v) for v in snarls.values()) >= 15
    decompose_to_snarl_file(str(d["gbz"]), str(d["dist"]),
                            str(out_gbz), {"chr1"})
    _h1, r1 = _read_keyed(out_gfa / "snarl_analyse.tsv", key_col=4)
    _h2, r2 = _read_keyed(out_gbz / "snarl_analyse.tsv", key_col=4)
    assert set(r1) == set(r2), "GFA vs GBZ decomposition keys differ"

    pheno, samples = parse_binary_pheno(str(d["pheno"]), [])
    out_tsv = d["tmp"] / "binary_table_vcf.tsv"
    run_vcf_analysis(str(d["at_vcf"]), snarls, str(out_tsv), "binary",
                     binary_phenotype=pheno, sample_names=samples,
                     use_mesh=False)
    _h, rows = _read_keyed(out_tsv)
    tested = [c for c in rows.values() if c[6] != "NA"]
    assert len(tested) >= 10
    for c in tested:
        assert 0.0 <= float(c[6]) <= 1.0


def test_vg_graph_mode_runs(vg_dataset):
    """`stoat graph` on the vg-built GBZ (haplotype paths from the
    GBWT): the native prepare partitions real vg sample paths."""
    from stoat_tpu.graph.association import run_graph_association

    d = vg_dataset
    out = d["tmp"] / "graph_out"
    out.mkdir(exist_ok=True)
    rc = run_graph_association(str(d["gbz"]), str(d["dist"]),
                               str(d["pheno"]), "chi2", "tsv", 0,
                               "chr1", str(out))
    assert rc == 0
    with open(out / "binary_table_graph.tsv") as fh:
        assert len(fh.readlines()) >= 10


@pytest.mark.skipif(STOAT_BIN is None,
                    reason="STOAT_BIN not set (no reference build)")
def test_reference_binary_diff(vg_dataset):
    """Reference stoat vs stoat-tpu on IDENTICAL vg-built inputs:
    decomposition keys must match (orientation-insensitive) and the
    binary GWAS tables must agree row-for-row on the keyed comparison
    (the reference's own system-test semantics,
    tests/system/compare_files_utils.cpp:226-252)."""
    from stoat_tpu.graph.decompose import decompose_to_snarl_file
    from stoat_tpu.io.phenotype import parse_binary_pheno
    from stoat_tpu.pipeline.runner import run_vcf_analysis

    d = vg_dataset
    ref_out = d["tmp"] / "ref_out"
    ref_out.mkdir(exist_ok=True)
    _run([STOAT_BIN, "vcf", "-p", str(d["vg"]), "-d", str(d["dist"]),
          "-v", str(d["at_vcf"]), "-b", str(d["pheno"]),
          "-o", str(ref_out), "-r", "chr1"])
    our_out = d["tmp"] / "our_out"
    snarls = decompose_to_snarl_file(str(d["gfa"]), str(d["dist"]),
                                     str(our_out), {"chr1"})
    _h, ref_dec = _read_keyed(ref_out / "snarl_analyse.tsv", key_col=4)
    _h, our_dec = _read_keyed(our_out / "snarl_analyse.tsv", key_col=4)
    assert set(ref_dec) == set(our_dec)

    pheno, samples = parse_binary_pheno(str(d["pheno"]), [])
    ours = d["tmp"] / "our_binary.tsv"
    run_vcf_analysis(str(d["at_vcf"]), snarls, str(ours), "binary",
                     binary_phenotype=pheno, sample_names=samples,
                     use_mesh=False)
    _h, ref_rows = _read_keyed(ref_out / "binary_table_vcf.tsv")
    _h, our_rows = _read_keyed(ours)
    assert set(ref_rows) == set(our_rows)
    for key, rc_ in ref_rows.items():
        oc = our_rows[key]
        # P_FISHER, P_CHI2, GROUP_PATHS, DEPTH must agree exactly
        assert rc_[5:7] == oc[5:7], key
        assert rc_[8] == oc[8], key
