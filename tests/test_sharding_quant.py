"""Mesh-shape value-parity for the quantitative (OLS) sharded path."""

import numpy as np
import pytest

from stoat_tpu.io.snarl_file import parse_snarl_path
from stoat_tpu.io.vcf import VcfReader
from stoat_tpu.io.phenotype import parse_quantitative_pheno
from stoat_tpu.matrix import EdgeHaplotypeMatrix
from stoat_tpu.pipeline.quantitative import quantitative_analyze_chromosome
from stoat_tpu.parallel import (make_snarl_mesh, quantitative_analyze_sharded,
                                shard_packed_chromosome)
from stoat_tpu.tables import pack_chromosome
from stoat_tpu.writer import format_p

from fixtures import make_fixture


@pytest.fixture(scope="module")
def workload(tmp_path_factory):
    tmpdir = tmp_path_factory.mktemp("shardq")
    paths = make_fixture(str(tmpdir), n_samples=40, n_snarls=24, seed=13)
    reader = VcfReader(paths["vcf"])
    _, records = next(iter(reader.chromosome_chunks()))
    matrix = EdgeHaplotypeMatrix(2 * len(paths["samples"]))
    for rec in records:
        matrix.add_record(rec)
    snarls = parse_snarl_path(paths["snarl"])["ref"]
    pheno = parse_quantitative_pheno(paths["quantitative"],
                                     list(paths["samples"]))
    return snarls, matrix, pheno


@pytest.mark.parametrize("n_devices", [4])
def test_logistic_mesh_parity(workload, n_devices):
    from stoat_tpu.io.phenotype import parse_binary_pheno
    from stoat_tpu.pipeline.quantitative import binary_covar_analyze_chromosome
    from stoat_tpu.parallel import binary_covar_analyze_sharded
    snarls, matrix, _ = workload
    n_samples = matrix.n_haplotypes // 2
    rng = np.random.default_rng(0)
    pheno_b = rng.integers(0, 2, n_samples).astype(bool)

    packed = pack_chromosome(snarls, matrix)
    base = binary_covar_analyze_chromosome(packed, pheno_b, None, 3, 5, 0.05)
    S = packed.n_snarls

    mesh = make_snarl_mesh(n_devices=n_devices)
    sharded = shard_packed_chromosome(snarls, matrix, n_devices)
    out = binary_covar_analyze_sharded(sharded, pheno_b, mesh, 3, 5, 0.05)
    np.testing.assert_array_equal(out["filtered"], base["filtered"][:S])
    for key in ("p", "beta", "se"):
        np.testing.assert_allclose(out[key], base[key][:S], rtol=1e-9,
                                   equal_nan=True)
        for i in range(S):
            if not base["filtered"][i]:
                assert format_p(out[key][i]) == format_p(base[key][i])


@pytest.mark.parametrize("n_devices", [2, 8])
def test_quant_mesh_parity(workload, n_devices):
    snarls, matrix, pheno = workload
    packed = pack_chromosome(snarls, matrix)
    base = quantitative_analyze_chromosome(packed, pheno, None, 3, 5, 0.05)
    S = packed.n_snarls

    mesh = make_snarl_mesh(n_devices=n_devices)
    sharded = shard_packed_chromosome(snarls, matrix, n_devices)
    out = quantitative_analyze_sharded(sharded, pheno, None, mesh, 3, 5,
                                       0.05)
    np.testing.assert_array_equal(out["filtered"], base["filtered"][:S])
    for key in ("p", "beta", "se", "r2"):
        np.testing.assert_allclose(out[key], base[key][:S], rtol=1e-10,
                                   equal_nan=True)
        for i in range(S):
            if not base["filtered"][i]:
                assert format_p(out[key][i]) == format_p(base[key][i])


@pytest.mark.parametrize("n_devices", [2, 8])
def test_lmm_mesh_parity(workload, n_devices):
    """Kinship LMM: sharded == single-device, string-identical rows."""
    from stoat_tpu.pipeline.quantitative import lmm_analyze_chromosome
    from stoat_tpu.parallel import lmm_analyze_sharded
    from stoat_tpu.stats.lmm import fit_null_reml

    snarls, matrix, pheno = workload
    n = matrix.n_haplotypes // 2
    rng = np.random.default_rng(7)
    G = rng.normal(size=(n, 8))
    K = G @ G.T / 8
    d = np.sqrt(np.diag(K))
    K = K / np.outer(d, d)
    ctx = fit_null_reml(pheno, K)

    packed = pack_chromosome(snarls, matrix)
    base = lmm_analyze_chromosome(packed, ctx, None, 3, 5, 0.05)
    S = packed.n_snarls

    mesh = make_snarl_mesh(n_devices=n_devices)
    sharded = shard_packed_chromosome(snarls, matrix, n_devices)
    out = lmm_analyze_sharded(sharded, ctx, None, mesh, 3, 5, 0.05)
    np.testing.assert_array_equal(out["filtered"], base["filtered"][:S])
    for key in ("p", "beta", "se", "r2"):
        np.testing.assert_allclose(out[key], base[key][:S], rtol=1e-9,
                                   equal_nan=True)
        for i in range(S):
            if not base["filtered"][i]:
                assert format_p(out[key][i]) == format_p(base[key][i])
