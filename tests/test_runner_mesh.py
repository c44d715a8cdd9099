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
