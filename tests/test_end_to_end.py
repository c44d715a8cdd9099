"""End-to-end pipeline tests: CLI -> output TSV vs the scalar oracle.

Runs the full `stoat vcf` flow (snarl file + VCF + phenotype) on a
synthetic fixture and cross-checks every output row against the independent
per-snarl scalar implementation in tests/reference_impl.py — the same
cross-validation strategy the reference uses (tests/regression/).
"""

import os

import numpy as np
import pytest

from stoat_tpu.cli import main as cli_main
from stoat_tpu.formatting import set_precision
from stoat_tpu.io.snarl_file import parse_snarl_path
from stoat_tpu.io.vcf import VcfReader
from stoat_tpu.matrix import EdgeHaplotypeMatrix

from fixtures import make_fixture
import reference_impl as R


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    tmpdir = tmp_path_factory.mktemp("gwas")
    return make_fixture(str(tmpdir)), str(tmpdir)


def _load_matrix(paths):
    reader = VcfReader(paths["vcf"])
    chunks = list(reader.chromosome_chunks())
    assert len(chunks) == 1
    _, records = chunks[0]
    m = EdgeHaplotypeMatrix(2 * len(paths["samples"]))
    for rec in records:
        m.add_record(rec)
    return m, m.shrink()


def _read_tsv(path):
    with open(path) as fh:
        header = fh.readline().rstrip("\n").split("\t")
        rows = [line.rstrip("\n").split("\t") for line in fh
                if line.rstrip("\n")]
    return header, {r[3]: r for r in rows}  # keyed by SNARL (+GENE later)


def fmt(p):
    return "NA" if (p != p) else set_precision(float(p))


def test_binary_end_to_end(fixture):
    paths, tmpdir = fixture
    out = os.path.join(tmpdir, "out_binary")
    rc = cli_main(["vcf", "-s", paths["snarl"], "-v", paths["vcf"],
                   "-b", paths["binary"], "-o", out])
    assert rc == 0
    header, rows = _read_tsv(os.path.join(out, "binary_table_vcf.tsv"))
    assert header == ["#CHR", "START_POS", "END_POS", "SNARL",
                      "PATH_LENGTHS", "P_FISHER", "P_CHI2", "GROUP_PATHS",
                      "DEPTH"]

    snarls = parse_snarl_path(paths["snarl"])["ref"]
    edge_matrix, M = _load_matrix(paths)
    from stoat_tpu.io.phenotype import parse_binary_pheno
    pheno, _ = parse_binary_pheno(paths["binary"], list(paths["samples"]))

    n_written = 0
    for snarl in snarls:
        ref = R.binary_reference(snarl, edge_matrix, M, pheno, 3, 5, 0.05)
        if ref is None:
            assert snarl.snarl_id_str not in rows
            continue
        n_written += 1
        pf, pc, g0k, g1k = ref
        row = rows[snarl.snarl_id_str]
        # chi2 string must match exactly; fisher via float tolerance
        # (scipy's exact test vs the PLINK scan agree to ~1e-6 relative)
        assert row[6] == fmt(pc), (snarl.snarl_id_str, row)
        if np.isnan(pf):
            assert row[5] == "NA"
        else:
            got = float(row[5]) if row[5] != "NA" else np.nan
            assert got == pytest.approx(pf, rel=1e-4), snarl.snarl_id_str
        expected_groups = ",".join(
            f"{int(a)}:{int(b)}" for a, b in zip(g0k, g1k))
        assert row[7] == expected_groups
        assert row[4] == snarl.type_var_str
    assert n_written == len(rows)
    assert n_written > 0


def test_quantitative_end_to_end(fixture):
    paths, tmpdir = fixture
    out = os.path.join(tmpdir, "out_quant")
    rc = cli_main(["vcf", "-s", paths["snarl"], "-v", paths["vcf"],
                   "-q", paths["quantitative"], "-o", out])
    assert rc == 0
    header, rows = _read_tsv(os.path.join(out, "quantitative_table_vcf.tsv"))
    assert header[:6] == ["#CHR", "START_POS", "END_POS", "SNARL",
                          "PATH_LENGTHS", "P"]

    snarls = parse_snarl_path(paths["snarl"])["ref"]
    edge_matrix, M = _load_matrix(paths)
    from stoat_tpu.io.phenotype import parse_quantitative_pheno
    pheno = parse_quantitative_pheno(paths["quantitative"],
                                     list(paths["samples"]))

    n_written = 0
    for snarl in snarls:
        ref = R.quantitative_reference(snarl, edge_matrix, M, pheno, None,
                                       3, 5, 0.05)
        if ref is None:
            assert snarl.snarl_id_str not in rows
            continue
        n_written += 1
        row = rows[snarl.snarl_id_str]
        if ref == "degenerate":
            assert row[5] == "NA"
            continue
        p, b, s, r2, allele_paths = ref
        assert row[5] == fmt(p), (snarl.snarl_id_str, row)
        assert row[6] == fmt(r2)
        assert row[7] == fmt(b)
        assert row[8] == fmt(s)
        assert row[9] == ",".join(str(int(x)) for x in allele_paths)
    assert n_written == len(rows)
    assert n_written > 0


def test_quantitative_covar_end_to_end(fixture):
    paths, tmpdir = fixture
    out = os.path.join(tmpdir, "out_quant_covar")
    rc = cli_main(["vcf", "-s", paths["snarl"], "-v", paths["vcf"],
                   "-q", paths["quantitative"], "-c", paths["covariate"],
                   "-C", "AGE,SEX", "-o", out])
    assert rc == 0
    _, rows = _read_tsv(os.path.join(out, "quantitative_table_vcf.tsv"))

    snarls = parse_snarl_path(paths["snarl"])["ref"]
    edge_matrix, M = _load_matrix(paths)
    from stoat_tpu.io.phenotype import (parse_covariates,
                                        parse_quantitative_pheno)
    pheno = parse_quantitative_pheno(paths["quantitative"],
                                     list(paths["samples"]))
    covar = parse_covariates(paths["covariate"], ["AGE", "SEX"],
                             list(paths["samples"]))

    checked = 0
    for snarl in snarls:
        ref = R.quantitative_reference(snarl, edge_matrix, M, pheno, covar,
                                       3, 5, 0.05)
        if ref is None or ref == "degenerate":
            continue
        p, b, s, r2, _ = ref
        row = rows[snarl.snarl_id_str]
        assert row[5] == fmt(p), (snarl.snarl_id_str, row)
        assert row[7] == fmt(b)
        checked += 1
    assert checked > 0


def test_binary_covar_end_to_end(fixture):
    paths, tmpdir = fixture
    out = os.path.join(tmpdir, "out_binary_covar")
    rc = cli_main(["vcf", "-s", paths["snarl"], "-v", paths["vcf"],
                   "-b", paths["binary"], "-c", paths["covariate"],
                   "-C", "AGE,SEX", "-o", out])
    assert rc == 0
    header, rows = _read_tsv(os.path.join(out, "binary_table_vcf.tsv"))
    assert header == ["#CHR", "START_POS", "END_POS", "SNARL",
                      "PATH_LENGTHS", "P", "BETA", "SE", "ALLELE_PATHS",
                      "DEPTH"]

    snarls = parse_snarl_path(paths["snarl"])["ref"]
    edge_matrix, M = _load_matrix(paths)
    from stoat_tpu.io.phenotype import parse_binary_pheno
    pheno, _ = parse_binary_pheno(paths["binary"], list(paths["samples"]))

    checked = 0
    for snarl in snarls:
        ref = R.binary_covar_reference(snarl, edge_matrix, M, pheno,
                                       3, 5, 0.05)
        if ref is None:
            assert snarl.snarl_id_str not in rows
            continue
        row = rows[snarl.snarl_id_str]
        if ref == "degenerate" or ref[0] == "NA":
            assert row[5] == "NA"
            continue
        p, b, s, allele_paths = ref
        assert row[5] == fmt(p), (snarl.snarl_id_str, row)
        assert row[6] == fmt(b)
        assert row[7] == fmt(s)
        assert row[8] == ",".join(str(int(x)) for x in allele_paths)
        checked += 1
    assert checked > 0


def test_eqtl_end_to_end(fixture):
    paths, tmpdir = fixture
    out = os.path.join(tmpdir, "out_eqtl")
    rc = cli_main(["vcf", "-s", paths["snarl"], "-v", paths["vcf"],
                   "-e", paths["qtl"], "-G", paths["gene_position"],
                   "-o", out])
    assert rc == 0
    with open(os.path.join(out, "eqtl_table_vcf.tsv")) as fh:
        header = fh.readline().rstrip("\n").split("\t")
        rows = {}
        for line in fh:
            cols = line.rstrip("\n").split("\t")
            rows[(cols[3], cols[5])] = cols  # (SNARL, GENE)
    assert header[5] == "GENE"

    snarls = parse_snarl_path(paths["snarl"])["ref"]
    edge_matrix, M = _load_matrix(paths)
    from stoat_tpu.io.phenotype import parse_qtl_gene_file
    eqtl_map = parse_qtl_gene_file(paths["qtl"], paths["gene_position"],
                                   list(paths["samples"]))
    gene_list = eqtl_map["ref"]

    checked = 0
    for snarl in snarls:
        n_samples = len(paths["samples"])
        df, used_idx, allele_paths = R.quantitative_table(
            snarl, edge_matrix, M, n_samples)
        if R.filtration_quantitative(df, 3, 5, 0.05):
            continue
        df2 = R.combine_identical_columns(df)[:, :-1]
        if df2.shape[1] == 0:
            continue
        lo = snarl.start_pos - 1000000 if snarl.start_pos > 1000000 else 0
        hi = snarl.end_pos + 1000000
        for g in gene_list:
            if g.end_pos < lo or g.start_pos > hi:
                continue
            y = g.sample_expression[used_idx]
            p, b, s, r2 = R.ols_reference(df2, y, None)
            row = rows[(snarl.snarl_id_str, g.gene_name)]
            assert row[6] == fmt(p), (snarl.snarl_id_str, g.gene_name)
            assert row[8] == fmt(b)
            checked += 1
    assert checked > 0


def test_dual_phenotype_single_pass(tmp_path):
    """-b AND -q in one invocation (one ingest, one upload, both
    analyses — extension over the reference's one-run-per-phenotype):
    outputs byte-identical to two separate runs."""
    import filecmp

    from stoat_tpu.cli import main as cli_main
    from fixtures import make_fixture

    paths = make_fixture(str(tmp_path), n_samples=30, n_snarls=40, seed=11)
    for name, args_extra in (
            ("dual", ["-b", paths["binary"], "-q", paths["quantitative"]]),
            ("bin", ["-b", paths["binary"]]),
            ("quant", ["-q", paths["quantitative"]])):
        out = tmp_path / f"out_{name}"
        rc = cli_main(["vcf", "-s", paths["snarl"], "-v", paths["vcf"],
                       *args_extra, "-o", str(out)])
        assert rc == 0
    assert filecmp.cmp(tmp_path / "out_dual" / "binary_table_vcf.tsv",
                       tmp_path / "out_bin" / "binary_table_vcf.tsv",
                       shallow=False)
    assert filecmp.cmp(
        tmp_path / "out_dual" / "quantitative_table_vcf.tsv",
        tmp_path / "out_quant" / "quantitative_table_vcf.tsv",
        shallow=False)


def test_dual_phenotype_api_contract(tmp_path, monkeypatch):
    """run_vcf_analysis called per its OWN documented contract: the
    secondary phenotype lives in the ``secondary`` dict and the primary
    ``quantitative_phenotype`` arg is None (binary-mode run).  Round 3
    read the primary arg in the fused path (runner.py:433) so this exact
    call crashed with jnp.asarray(None) — this test pins the contract
    and asserts the fused single-dispatch path actually ran."""
    import filecmp

    import stoat_tpu.pipeline.runner as runner_mod
    from stoat_tpu.cli import main as cli_main
    from stoat_tpu.io.phenotype import (parse_binary_pheno,
                                        parse_quantitative_pheno)
    from stoat_tpu.io.snarl_file import parse_snarl_path
    from stoat_tpu.io.vcf import VcfReader
    from fixtures import make_fixture

    paths = make_fixture(str(tmp_path), n_samples=30, n_snarls=40, seed=11)
    reader = VcfReader(paths["vcf"])
    samples = list(reader.samples)
    reader.close()
    binary_phenotype, _ = parse_binary_pheno(paths["binary"], samples)
    quantitative_phenotype = parse_quantitative_pheno(
        paths["quantitative"], samples)
    snarls_chr = parse_snarl_path(paths["snarl"])

    fused_calls = []
    real_fused = runner_mod._analyze_dual_fused

    def spy(*args, **kwargs):
        fused_calls.append(1)
        return real_fused(*args, **kwargs)

    monkeypatch.setattr(runner_mod, "_analyze_dual_fused", spy)

    out = tmp_path / "out_api"
    out.mkdir()
    bin_tsv = out / "binary_table_vcf.tsv"
    quant_tsv = out / "quantitative_table_vcf.tsv"
    runner_mod.run_vcf_analysis(
        paths["vcf"], snarls_chr, str(bin_tsv), "binary",
        binary_phenotype=binary_phenotype,
        # quantitative_phenotype deliberately NOT passed: the contract
        # says the secondary dict carries it (runner.py docstring).
        secondary={
            "mode": "quantitative",
            "output_tsv": str(quant_tsv),
            "quantitative_phenotype": quantitative_phenotype,
        },
        # pin the single-device fused path (the mesh-sharded dual is
        # covered by test_runner_mesh); under the virtual 8-device
        # conftest the auto route would take the sharded program
        use_mesh=False,
        sample_names=samples)
    assert fused_calls, "the fused dual-dispatch path did not run"

    # Same outputs as two independent CLI runs.
    for name, args_extra in (("bin", ["-b", paths["binary"]]),
                             ("quant", ["-q", paths["quantitative"]])):
        o = tmp_path / f"out_{name}"
        rc = cli_main(["vcf", "-s", paths["snarl"], "-v", paths["vcf"],
                       *args_extra, "-o", str(o)])
        assert rc == 0
    assert filecmp.cmp(bin_tsv, tmp_path / "out_bin" /
                       "binary_table_vcf.tsv", shallow=False)
    assert filecmp.cmp(quant_tsv, tmp_path / "out_quant" /
                       "quantitative_table_vcf.tsv", shallow=False)


def test_secondary_dict_validation(tmp_path):
    """A malformed secondary dict fails fast with a clear message."""
    import numpy as np
    import pytest as _pytest

    from stoat_tpu.io.snarl_file import parse_snarl_path
    from stoat_tpu.pipeline.runner import run_vcf_analysis
    from fixtures import make_fixture

    paths = make_fixture(str(tmp_path), n_samples=10, n_snarls=4, seed=3)
    snarls_chr = parse_snarl_path(paths["snarl"])
    pheno = np.zeros(10, bool)
    for bad, match in (
            ({"mode": "quantitative"}, "output_tsv"),
            ({"mode": "nope", "output_tsv": "x"}, "not one of"),
            ({"mode": "quantitative", "output_tsv": "x"},
             "quantitative_phenotype")):
        with _pytest.raises(ValueError, match=match):
            run_vcf_analysis(
                paths["vcf"], snarls_chr,
                str(tmp_path / "o.tsv"), "binary",
                binary_phenotype=pheno, secondary=bad)


def test_dual_fused_with_covariates_matches_separate(tmp_path):
    """Round-5: the fused dual program carries covariates through to the
    quantitative side (with_covar design inside the fused kernel);
    outputs must equal the separate covariate-adjusted quantitative run
    byte for byte."""
    import filecmp

    import numpy as np

    from fixtures import make_fixture
    from stoat_tpu.io.phenotype import (parse_binary_pheno,
                                        parse_quantitative_pheno)
    from stoat_tpu.io.snarl_file import parse_snarl_path
    from stoat_tpu.pipeline.runner import run_vcf_analysis

    paths = make_fixture(str(tmp_path), n_samples=30, n_snarls=40,
                         seed=23, n_chroms=1)
    snarls_chr = parse_snarl_path(paths["snarl"])
    pheno, samples = parse_binary_pheno(paths["binary"],
                                        list(paths["samples"]))
    pheno_q = parse_quantitative_pheno(paths["quantitative"], samples)
    rng = np.random.default_rng(2)
    covar = rng.standard_normal((len(samples), 2))

    b1 = str(tmp_path / "dual_b.tsv")
    q1 = str(tmp_path / "dual_q.tsv")
    run_vcf_analysis(paths["vcf"], snarls_chr, b1, "binary",
                     binary_phenotype=pheno, covariate=covar,
                     sample_names=samples, use_mesh=False,
                     secondary={"mode": "quantitative",
                                "output_tsv": q1,
                                "quantitative_phenotype": pheno_q})
    b2 = str(tmp_path / "solo_b.tsv")
    q2 = str(tmp_path / "solo_q.tsv")
    run_vcf_analysis(paths["vcf"], snarls_chr, b2, "binary",
                     binary_phenotype=pheno, sample_names=samples,
                     use_mesh=False)
    run_vcf_analysis(paths["vcf"], snarls_chr, q2, "quantitative",
                     quantitative_phenotype=pheno_q, covariate=covar,
                     sample_names=samples, use_mesh=False)
    assert filecmp.cmp(b1, b2, shallow=False)
    assert filecmp.cmp(q1, q2, shallow=False)
    # and the MESH dual with covariates matches byte for byte too
    # (topology must not change published statistics)
    b3 = str(tmp_path / "mesh_b.tsv")
    q3 = str(tmp_path / "mesh_q.tsv")
    run_vcf_analysis(paths["vcf"], snarls_chr, b3, "binary",
                     binary_phenotype=pheno, covariate=covar,
                     sample_names=samples, use_mesh=True,
                     secondary={"mode": "quantitative",
                                "output_tsv": q3,
                                "quantitative_phenotype": pheno_q})
    assert filecmp.cmp(b1, b3, shallow=False)
    assert filecmp.cmp(q1, q3, shallow=False)
