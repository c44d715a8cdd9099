"""GAF emitter tests: proportion invariants (bounds, sum <= 60; pinned by
tests/unittest/gaf_creator_unit.cpp:8-33) and end-to-end emission via the
CLI ``-g`` flag."""

import os

import numpy as np
import pytest

from stoat_tpu.gaf import calcul_proportion_signi, _split_on_star
from stoat_tpu.cli import main as cli_main

from test_cli_decompose import build_fixture


@pytest.mark.parametrize("g0,g1,p", [
    (10, 20, 0.5), (0, 0, 0.5), (30, 0, 1e-10), (0, 30, 1e-10),
    (5, 5, 1.0), (100, 1, 1e-30),
])
def test_proportion_bounds(g0, g1, p):
    a, b = calcul_proportion_signi(g0, g1, p)
    assert 0.0 <= a <= 60.0
    assert 0.0 <= b <= 60.0
    assert a + b <= 60.0 + 1e-9


def test_proportion_zero_total():
    assert calcul_proportion_signi(0, 0, 0.5) == (0.0, 0.0)


def test_split_on_star():
    assert [x[0] for x in _split_on_star(">1>2>4")] == [">1>2>4"]
    assert [x[0] for x in _split_on_star(">1>2>0>6>7")] == [">1>2", ">6>7"]
    # node ids containing the digit 0 are NOT stars (reference bug fixed)
    assert [x[0] for x in _split_on_star(">10>20")] == [">10>20"]


def test_gaf_end_to_end(tmp_path):
    gfa, dist, vcf, pheno = build_fixture(tmp_path)
    out = str(tmp_path / "out_gaf")
    rc = cli_main(["vcf", "-p", gfa, "-d", dist, "-v", vcf, "-b", pheno,
                   "-o", out, "-I", "2", "-H", "2", "-M", "0.0", "-g"])
    assert rc == 0
    f0 = os.path.join(out, "binary_table_vcf_0.gaf")
    f1 = os.path.join(out, "binary_table_vcf_1.gaf")
    assert os.path.exists(f0) and os.path.exists(f1)
    with open(f0) as fh:
        lines = [l.rstrip("\n").split("\t") for l in fh if l.strip()]
    assert lines, "GAF file should have rows"
    for name, path, length, prop in lines:
        assert "_G0_" in name
        assert path.startswith(">") or path.startswith("<")
        assert int(length) > 0
        assert 0.0 <= float(prop) <= 60.0
