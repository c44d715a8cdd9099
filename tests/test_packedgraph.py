"""PackedGraph (.pg) reader: exact parity with the HashGraph twins.

Every fixture in the reference zoo ships as both .pg and .hg; the two
must load to identical graphs (nodes+sequences, canonical edge sets,
named oriented paths).  Also pins one decomposition run directly from a
.pg to guard the dispatch path (reference loads .pg via libbdsg,
src/io/register_loader_saver_packed_graph.cpp)."""

import glob
import os

import pytest

from stoat_tpu.graph.hashgraph import load_hg
from stoat_tpu.graph.packedgraph import load_pg

ZOO = "/root/reference/tests/graph_test"

pytestmark = pytest.mark.skipif(not os.path.isdir(ZOO),
                                reason="reference fixtures unavailable")

FIXTURES = sorted(os.path.basename(p)[:-3]
                  for p in glob.glob(os.path.join(ZOO, "*.pg")))


def canon(g):
    nodes = {n: g.sequences[n] for n in g.node_ids()}
    edges = set()
    for n in g.node_ids():
        for rev in (False, True):
            for t in g.successors((n, rev)):
                a, b = (n, rev), t
                edges.add(min((a, b), ((b[0], not b[1]), (a[0], not a[1]))))
    paths = sorted((p.name, tuple(p.steps)) for p in g.paths)
    return nodes, edges, paths


@pytest.mark.parametrize("name", FIXTURES)
def test_pg_matches_hg(name):
    a = canon(load_pg(os.path.join(ZOO, f"{name}.pg"), {"ref"}))
    b = canon(load_hg(os.path.join(ZOO, f"{name}.hg"), {"ref"}))
    assert a[0] == b[0], "node/sequence mismatch"
    assert a[1] == b[1], "edge set mismatch"
    assert a[2] == b[2], "path mismatch"


def test_magic_rejects_hg():
    with pytest.raises(RuntimeError, match="not a PackedGraph"):
        load_pg(os.path.join(ZOO, "linear.hg"))


def test_decompose_from_pg():
    from stoat_tpu.graph.decompose import decompose_graph
    g = load_pg(os.path.join(ZOO, "simple_snp.pg"), {"ref"})
    cm = decompose_graph(g, {"ref"}, cycle_threshold=0)
    assert len(cm["ref"]) == 1
    s = cm["ref"][0]
    assert frozenset(s.snarl_ids) == frozenset((2, 5))


def test_cli_decompose_from_pg(tmp_path):
    from stoat_tpu.graph.decompose import decompose_to_snarl_file
    out = decompose_to_snarl_file(os.path.join(ZOO, "simple_snp.pg"),
                                  None, str(tmp_path), {"ref"},
                                  cycle_threshold=0)
    assert len(out["ref"]) == 1
    assert os.path.exists(tmp_path / "snarl_analyse.tsv")
