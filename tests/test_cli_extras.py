"""CLI extras: BHcorrect, multi-chromosome runs, -T significant tables,
chunked-vs-unchunked parity."""

import filecmp
import os

import numpy as np
import pytest

from stoat_tpu.cli import main as cli_main
from stoat_tpu.corrections import adjust_pvalues_bh
from stoat_tpu.formatting import set_precision, string_to_pvalue

from fixtures import make_fixture


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    tmpdir = tmp_path_factory.mktemp("extras")
    return make_fixture(str(tmpdir), n_samples=40, n_snarls=14, seed=17), \
        str(tmpdir)


def test_bhcorrect_subcommand(fixture, tmp_path):
    paths, _ = fixture
    out = str(tmp_path / "bh")
    rc = cli_main(["vcf", "-s", paths["snarl"], "-v", paths["vcf"],
                   "-b", paths["binary"], "-o", out])
    assert rc == 0
    tsv = os.path.join(out, "binary_table_vcf.tsv")
    with open(tsv) as fh:
        fh.readline()
        before = [line.rstrip("\n").split("\t") for line in fh
                  if line.strip()]
    raw_p = np.array([string_to_pvalue(r[6]) for r in before])
    expected_adj = adjust_pvalues_bh(raw_p)

    rc = cli_main(["BHcorrect", "-t", tsv, "-p", "7", "-a", "8",
                   "-o", out])
    assert rc == 0
    with open(tsv) as fh:
        fh.readline()
        after = [line.rstrip("\n").split("\t") for line in fh
                 if line.strip()]
    for row, adj in zip(after, expected_adj):
        assert row[7] == set_precision(float(adj))
    # significant file exists (likely empty body at these p-values)
    assert os.path.exists(os.path.join(out, "top_variant.tsv"))


def test_multi_chromosome(tmp_path):
    """Two chromosomes in one snarl file + VCF; both analyzed."""
    d1 = make_fixture(str(tmp_path / "c1"), n_samples=20, n_snarls=5,
                      seed=1, chrom="chr1")
    d2 = make_fixture(str(tmp_path / "c2"), n_samples=20, n_snarls=5,
                      seed=2, chrom="chr2")

    # merge snarl files
    snarl = tmp_path / "snarls.tsv"
    with open(snarl, "w") as out:
        with open(d1["snarl"]) as fh:
            out.write(fh.read())
        with open(d2["snarl"]) as fh:
            fh.readline()
            out.write(fh.read())

    # merge VCFs (samples identical by construction)
    vcf = tmp_path / "merged.vcf"
    with open(vcf, "w") as out:
        with open(d1["vcf"]) as fh:
            out.write(fh.read())
        with open(d2["vcf"]) as fh:
            for line in fh:
                if not line.startswith("#"):
                    out.write(line)

    out_dir = str(tmp_path / "out")
    rc = cli_main(["vcf", "-s", str(snarl), "-v", str(vcf),
                   "-b", d1["binary"], "-o", out_dir])
    assert rc == 0
    with open(os.path.join(out_dir, "binary_table_vcf.tsv")) as fh:
        fh.readline()
        chroms = {line.split("\t")[0] for line in fh if line.strip()}
    assert chroms == {"chr1", "chr2"}


def test_table_threshold_writes_regression_tables(fixture, tmp_path):
    paths, _ = fixture
    out = str(tmp_path / "tt")
    rc = cli_main(["vcf", "-s", paths["snarl"], "-v", paths["vcf"],
                   "-q", paths["quantitative"], "-o", out,
                   "-T", "1.0"])  # threshold 1.0: everything significant
    assert rc == 0
    reg_dir = os.path.join(out, "regression")
    assert os.path.isdir(reg_dir)
    tables = os.listdir(reg_dir)
    assert tables, "expected per-snarl regression tables"
    sample_table = os.path.join(reg_dir, tables[0])
    with open(sample_table) as fh:
        header = fh.readline().rstrip("\n").split("\t")
        rows = [line.rstrip("\n").split("\t") for line in fh
                if line.strip()]
    assert header[0] == "sample_name"
    assert rows and all(len(r) == len(header) for r in rows)


def test_chunked_matches_unchunked(fixture, tmp_path):
    paths, _ = fixture
    from stoat_tpu.io import parse_binary_pheno, parse_snarl_path
    from stoat_tpu.pipeline.runner import run_vcf_analysis

    snarls_chr = parse_snarl_path(paths["snarl"])
    pheno, samples = parse_binary_pheno(paths["binary"],
                                        list(paths["samples"]))

    out1 = str(tmp_path / "whole.tsv")
    out2 = str(tmp_path / "chunked.tsv")
    for out, chunk in ((out1, 8192), (out2, 3)):
        run_vcf_analysis(paths["vcf"], snarls_chr, out, "binary",
                         binary_phenotype=pheno, sample_names=samples,
                         snarl_chunk_size=chunk)
    assert filecmp.cmp(out1, out2, shallow=False)


def test_plot_subcommand(tmp_path):
    """stoat plot qq/manhattan/boxplot produce non-empty PNGs
    (plot_script/qq_mahanttan_plot.py + box_plox.R equivalents)."""
    import numpy as np
    from fixtures import make_fixture
    from stoat_tpu.cli import main as cli_main

    paths = make_fixture(str(tmp_path), n_samples=24, n_snarls=10, seed=11)
    out = str(tmp_path / "res")
    rc = cli_main(["vcf", "-s", paths["snarl"], "-v", paths["vcf"],
                   "-q", paths["quantitative"], "-T", "1.0", "-o", out])
    assert rc == 0
    tsv = os.path.join(out, "quantitative_table_vcf.tsv")
    tables = os.path.join(out, "regression")
    assert os.listdir(tables), "no -T tables dumped"

    qq = str(tmp_path / "qq.png")
    man = str(tmp_path / "man.png")
    box = str(tmp_path / "box")
    assert cli_main(["plot", "qq", "-t", tsv, "-o", qq]) == 0
    assert cli_main(["plot", "manhattan", "-t", tsv, "-o", man]) == 0
    assert cli_main(["plot", "boxplot", "-d", tables,
                     "-p", paths["quantitative"], "-o", box]) == 0
    for f in (qq, man):
        with open(f, "rb") as fh:
            assert fh.read(8).startswith(b"\x89PNG")
    boxes = os.listdir(box)
    assert boxes
    with open(os.path.join(box, boxes[0]), "rb") as fh:
        assert fh.read(8).startswith(b"\x89PNG")


def test_plot_histogram_scatter_report(tmp_path):
    """stoat plot histogram/scatter/report — tests/scripts/
    plot_histogram.py, plot_scatter.py, stoat_report_plots.rmd parity."""
    pytest.importorskip("matplotlib")
    from stoat_tpu.cli import main

    tsv = tmp_path / "r.tsv"
    with open(tsv, "w") as fh:
        fh.write("#CHR\tSTART_POS\tEND_POS\tSNARL\tPATH_LENGTHS\tP\n")
        for i in range(40):
            fh.write(f"ref\t{100+i*10}\t{105+i*10}\t{i}_{i+1}\t1,1\t"
                     f"{0.01 + 0.02*i:.4f}\n")
    out1 = tmp_path / "h.png"
    assert main(["plot", "histogram", "-t", str(tsv), "-o", str(out1),
                 "--x-col", "5", "--bins", "10"]) == 0
    assert out1.stat().st_size > 0
    out2 = tmp_path / "s.png"
    assert main(["plot", "scatter", "-t", str(tsv), "-o", str(out2),
                 "--x-col", "1", "--y-col", "5", "--color-col", "0"]) == 0
    assert out2.stat().st_size > 0
    rep = tmp_path / "rep"
    assert main(["plot", "report", "-t", str(tsv), "-o", str(rep)]) == 0
    made = sorted(p.name for p in rep.iterdir())
    assert made == ["report_manhattan.png", "report_pvalue_hist.png",
                    "report_qq.png"]


def test_adjusted_column_for_mode_matches_layouts():
    """The mode->adjusted-column map must point at each layout's P
    column (reference post_processing.cpp:41-56, 1-indexed there:
    7 binary/eqtl, 6 quant/covar)."""
    from stoat_tpu.post import adjusted_column_for_mode

    # binary: #CHR START END SNARL PATH_LENGTHS P_FISHER P_CHI2 ...
    assert adjusted_column_for_mode("binary") == 6          # P_CHI2
    # eqtl: #CHR START END SNARL PATH_LENGTHS GENE P ...
    assert adjusted_column_for_mode("eqtl") == 6            # P
    # quant/covar: #CHR START END SNARL PATH_LENGTHS P ...
    assert adjusted_column_for_mode("quantitative") == 5    # P
    assert adjusted_column_for_mode("binary_covar") == 5


def test_gaf_from_binary_container(tmp_path):
    """-g with a .gbz graph: GAF emission loads via the magic
    dispatcher (round-5 review: load_gfa used to crash on binary
    containers AFTER the whole GWAS finished)."""
    import subprocess
    import sys

    import numpy as np

    from fixtures import make_fixture
    from stoat_tpu.graph.gbz_write import save_gbz
    from stoat_tpu.graph.gfa import GfaGraph, GfaPath

    paths = make_fixture(str(tmp_path), n_samples=12, n_snarls=12,
                         seed=17, n_chroms=1)
    # a tiny graph whose node ids cover the snarl file's path nodes
    g = GfaGraph()
    max_node = 3 * 12 + 40
    for nid in range(1, max_node):
        g.add_node(nid, "ACG")
    g.add_path(GfaPath(name="ref", sample="ref", haplotype=0,
                       steps=[(1, False)], is_reference=True))
    gbz = tmp_path / "g.gbz"
    save_gbz(g, str(gbz))
    out = tmp_path / "gafout"
    rc = subprocess.run(
        [sys.executable, "-m", "stoat_tpu", "vcf",
         "-s", paths["snarl"], "-v", paths["vcf"],
         "-b", paths["binary"], "-p", str(gbz), "-g",
         "-o", str(out)],
        capture_output=True, text=True)
    assert rc.returncode == 0, rc.stderr[-800:]
    gafs = list(out.glob("*.gaf*"))
    assert gafs, list(out.iterdir())
