"""Mesh-shape value-parity tests: identical results on 1, 2, 4, 8 devices.

The multi-chip contract (SURVEY.md §5.8): same TSV values regardless of
mesh shape.  Runs on the virtual 8-device CPU mesh from conftest.
"""

import numpy as np
import pytest
import jax

from stoat_tpu.io.snarl_file import parse_snarl_path
from stoat_tpu.io.vcf import VcfReader
from stoat_tpu.matrix import EdgeHaplotypeMatrix
from stoat_tpu.pipeline.binary import binary_analyze_chromosome
from stoat_tpu.parallel import (
    binary_analyze_sharded,
    make_snarl_mesh,
    shard_packed_chromosome,
)
from stoat_tpu.tables import pack_chromosome

from fixtures import make_fixture


@pytest.fixture(scope="module")
def workload(tmp_path_factory):
    tmpdir = tmp_path_factory.mktemp("shard")
    paths = make_fixture(str(tmpdir), n_samples=50, n_snarls=30, seed=3)
    reader = VcfReader(paths["vcf"])
    _, records = next(iter(reader.chromosome_chunks()))
    matrix = EdgeHaplotypeMatrix(2 * len(paths["samples"]))
    for rec in records:
        matrix.add_record(rec)
    snarls = parse_snarl_path(paths["snarl"])["ref"]
    from stoat_tpu.io.phenotype import parse_binary_pheno
    pheno, _ = parse_binary_pheno(paths["binary"], list(paths["samples"]))
    return snarls, matrix, pheno


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8
    assert jax.devices()[0].platform == "cpu"


@pytest.mark.parametrize("n_devices", [1, 2, 4, 8])
def test_mesh_shape_value_parity(workload, n_devices):
    snarls, matrix, pheno = workload
    # Single-device baseline
    packed = pack_chromosome(snarls, matrix)
    base = binary_analyze_chromosome(packed, pheno, 3, 5, 0.05)
    S = packed.n_snarls

    mesh = make_snarl_mesh(n_devices=n_devices)
    sharded = shard_packed_chromosome(snarls, matrix, n_devices)
    out = binary_analyze_sharded(sharded, pheno, mesh, 3, 5, 0.05)

    assert out["p_chi2"].shape[0] == S
    np.testing.assert_array_equal(out["filtered"], base["filtered"][:S])
    np.testing.assert_array_equal(out["g0"].sum(axis=1),
                                  base["g0"][:S].sum(axis=1))
    # XLA may reassociate reductions differently per shard shape (1-ulp
    # float drift); the output contract is the formatted 4-significant-digit
    # string, which must be identical.
    np.testing.assert_allclose(out["p_chi2"], base["p_chi2"][:S],
                               rtol=1e-12, equal_nan=True)
    np.testing.assert_allclose(out["p_fisher"], base["p_fisher"][:S],
                               rtol=1e-12, equal_nan=True)
    from stoat_tpu.writer import format_p
    for i in range(S):
        assert format_p(out["p_chi2"][i]) == format_p(base["p_chi2"][i])
        assert format_p(out["p_fisher"][i]) == format_p(base["p_fisher"][i])
