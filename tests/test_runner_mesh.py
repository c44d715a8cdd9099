"""Production runner mesh path: sharded execution over the 8-device mesh
produces byte-identical TSVs to single-device execution for binary,
binary+covar and quantitative modes."""

import filecmp

import pytest

from stoat_tpu.io import parse_binary_pheno, parse_covariates, \
    parse_quantitative_pheno, parse_snarl_path
from stoat_tpu.pipeline.runner import run_vcf_analysis

from fixtures import make_fixture


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    tmpdir = tmp_path_factory.mktemp("runnermesh")
    paths = make_fixture(str(tmpdir), n_samples=36, n_snarls=21, seed=23)
    snarls_chr = parse_snarl_path(paths["snarl"])
    pheno_b, samples = parse_binary_pheno(paths["binary"],
                                          list(paths["samples"]))
    pheno_q = parse_quantitative_pheno(paths["quantitative"], samples)
    covar = parse_covariates(paths["covariate"], ["AGE", "SEX"], samples)
    return paths, snarls_chr, pheno_b, pheno_q, covar, samples, tmpdir


@pytest.mark.parametrize("mode", ["binary", "binary_covar", "quantitative"])
def test_mesh_runner_matches_single_device(data, mode, tmp_path):
    paths, snarls_chr, pheno_b, pheno_q, covar, samples, _ = data
    kwargs = dict(
        binary_phenotype=pheno_b, quantitative_phenotype=pheno_q,
        covariate=covar if mode != "binary" else None,
        sample_names=samples, snarl_chunk_size=7,
    )
    single = str(tmp_path / "single.tsv")
    meshed = str(tmp_path / "mesh.tsv")
    run_vcf_analysis(paths["vcf"], snarls_chr, single, mode,
                     use_mesh=False, **kwargs)
    run_vcf_analysis(paths["vcf"], snarls_chr, meshed, mode,
                     use_mesh=True, **kwargs)
    assert filecmp.cmp(single, meshed, shallow=False), mode


def test_mesh_runner_table_dumps_match(data, tmp_path):
    """-T table dumps: mesh and single-device produce identical result
    TSVs AND identical per-snarl significant-table files."""
    import os
    paths, snarls_chr, pheno_b, pheno_q, covar, samples, _ = data
    outs = {}
    for label, use_mesh in (("single", False), ("mesh", True)):
        rdir = str(tmp_path / f"tables_{label}")
        os.makedirs(rdir, exist_ok=True)
        tsv = str(tmp_path / f"{label}.tsv")
        run_vcf_analysis(
            paths["vcf"], snarls_chr, tsv, "quantitative",
            quantitative_phenotype=pheno_q, covariate=covar,
            sample_names=samples, snarl_chunk_size=7,
            table_threshold=1.0, regression_dir=rdir, use_mesh=use_mesh)
        outs[label] = (tsv, rdir)
    assert filecmp.cmp(outs["single"][0], outs["mesh"][0], shallow=False)
    single_tables = sorted(os.listdir(outs["single"][1]))
    mesh_tables = sorted(os.listdir(outs["mesh"][1]))
    assert single_tables == mesh_tables and single_tables, "no tables dumped"
    for name in single_tables:
        assert filecmp.cmp(os.path.join(outs["single"][1], name),
                           os.path.join(outs["mesh"][1], name),
                           shallow=False), name


def test_mesh_runner_eqtl_matches_single_device(data, tmp_path):
    """eQTL mode under the mesh (pair-axis shard_map) is byte-identical
    to single-device."""
    import numpy as np
    from stoat_tpu.io.phenotype import QtlData
    paths, snarls_chr, pheno_b, pheno_q, covar, samples, _ = data
    rng = np.random.default_rng(5)
    genes = [QtlData(f"gene{i}", rng.standard_normal(len(samples)),
                     100 + 400 * i, 300 + 400 * i) for i in range(6)]
    eqtl_map = {"ref": genes}
    single = str(tmp_path / "single_eqtl.tsv")
    meshed = str(tmp_path / "mesh_eqtl.tsv")
    for out, use_mesh in ((single, False), (meshed, True)):
        run_vcf_analysis(paths["vcf"], snarls_chr, out, "eqtl",
                         eqtl_map=eqtl_map, covariate=covar,
                         sample_names=samples, snarl_chunk_size=7,
                         use_mesh=use_mesh)
    assert filecmp.cmp(single, meshed, shallow=False)


def test_mesh_runner_dual_matches_single_device(data, tmp_path):
    """Mesh-sharded fused dual (-b -q single pass over the snarl mesh):
    both output TSVs byte-identical to the single-device dual run."""
    paths, snarls_chr, pheno_b, pheno_q, covar, samples, _ = data
    outs = {}
    for label, use_mesh in (("single", False), ("mesh", True)):
        b_tsv = str(tmp_path / f"{label}_b.tsv")
        q_tsv = str(tmp_path / f"{label}_q.tsv")
        run_vcf_analysis(
            paths["vcf"], snarls_chr, b_tsv, "binary",
            binary_phenotype=pheno_b, sample_names=samples,
            snarl_chunk_size=7, use_mesh=use_mesh,
            secondary={"mode": "quantitative", "output_tsv": q_tsv,
                       "quantitative_phenotype": pheno_q})
        outs[label] = (b_tsv, q_tsv)
    assert filecmp.cmp(outs["single"][0], outs["mesh"][0], shallow=False)
    assert filecmp.cmp(outs["single"][1], outs["mesh"][1], shallow=False)
