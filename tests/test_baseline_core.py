"""Sanity test for the single-core C++ baseline loop: its analyzed-snarl
count matches the scalar Python oracle's pass/filter decisions."""

import numpy as np
import pytest

from stoat_tpu.io.snarl_file import parse_snarl_path
from stoat_tpu.io.vcf import VcfReader
from stoat_tpu.io.phenotype import parse_binary_pheno, parse_quantitative_pheno
from stoat_tpu.matrix import EdgeHaplotypeMatrix
from stoat_tpu.tables import pack_chromosome

from fixtures import make_fixture
import reference_impl as R

native = pytest.importorskip("stoat_tpu.native")


def test_baseline_counts_match_oracle(tmp_path):
    if native.get_baseline_lib() is None:
        pytest.skip("baseline toolchain unavailable")
    fx = make_fixture(str(tmp_path), n_samples=30, n_snarls=20, seed=8)
    reader = VcfReader(fx["vcf"])
    _, recs = next(iter(reader.chromosome_chunks()))
    m = EdgeHaplotypeMatrix(60)
    for r in recs:
        m.add_record(r)
    snarls = parse_snarl_path(fx["snarl"])["ref"]
    packed = pack_chromosome(snarls, m)
    pb, _ = parse_binary_pheno(fx["binary"], list(fx["samples"]))
    pq = parse_quantitative_pheno(fx["quantitative"], list(fx["samples"]))

    import bench
    dense = np.vstack([packed.matrix,
                       np.zeros((1, packed.n_haplotypes), bool)])
    path_rows, row_offsets, snarl_offsets = bench._pack_for_baseline(
        packed, m, dense.shape[0] - 1)
    analyzed = native.run_baseline_cpp(
        dense.astype(np.uint8), path_rows, row_offsets,
        snarl_offsets, pb.astype(np.uint8), pq, 3, 5, 0.05)

    expected = 0
    for snarl in snarls:
        if R.binary_reference(snarl, m, packed.matrix, pb, 3, 5,
                              0.05) is not None:
            expected += 1
        res = R.quantitative_reference(snarl, m, packed.matrix, pq, None,
                                       3, 5, 0.05)
        if res is not None and res != "degenerate":
            expected += 1
    assert analyzed == expected
