"""Walk-set partitioning on the REAL partitioner fixtures (.hg), pinned
against path_partitioner_unit.cpp's expectations."""

import os

import pytest

from stoat_tpu.graph.hashgraph import load_hg
from stoat_tpu.graph.snarls import find_snarls
from stoat_tpu.graph.association import PathPartitioner

ZOO = "/root/reference/tests/graph_test"

pytestmark = pytest.mark.skipif(not os.path.isdir(ZOO),
                                reason="reference fixtures unavailable")


def setup(name):
    g = load_hg(os.path.join(ZOO, f"{name}.hg"))
    forest = find_snarls(g)
    part = PathPartitioner(g, g.paths)
    return g, forest, part


def sets_of(g, forest, part, pair, regular):
    idx = next(i for i, s in enumerate(forest.snarls)
               if {s.start_node, s.end_node} == set(pair))
    return sorted(sorted(s) for s in
                  part.partition_samples_in_snarl(forest, idx, regular))


def test_simple_nested_chain():
    # path_partitioner_unit.cpp:47-190 (nodes here are 1-based: +1)
    g, forest, part = setup("simple_nested_chain")
    ids = sorted(s.id_str for s in forest.snarls)
    assert ids == ["1_4", "4_8", "5_7", "8_10"]
    for regular in (False, True):
        assert sets_of(g, forest, part, (1, 4), regular) == [
            ["path0", "path1"], ["path2", "path3"]]
        assert sets_of(g, forest, part, (4, 8), regular) == [
            ["path0", "path1", "path3"], ["path2"]]
        assert sets_of(g, forest, part, (5, 7), regular) == [
            ["path0"], ["path1", "path3"]]


def test_loop_with_indel():
    g, forest, part = setup("loop_with_indel")
    pairs = {frozenset((s.start_node, s.end_node))
             for s in forest.snarls}
    assert frozenset((1, 6)) in pairs and frozenset((2, 4)) in pairs
    # duplication snarl: {0} vs {1,2} (walks1)
    assert sets_of(g, forest, part, (1, 6), False) == [
        ["path0"], ["path1", "path2"]]
    # nested snarl: 3 distinct ordered walk multisets (walks2/edges2)
    assert len(sets_of(g, forest, part, (2, 4), False)) == 3
    assert len(sets_of(g, forest, part, (2, 4), True)) == 3


def test_simple_bubble():
    g, forest, part = setup("simple_bubble")
    assert [s.id_str for s in forest.snarls] == ["1_5"]
    for regular in (False, True):
        assert sets_of(g, forest, part, (1, 5), regular) == [
            ["path0", "path1"], ["path2"], ["path3"]]


def test_loop_with_indel_two_paths():
    """path_partitioner_unit.cpp:378-467 ('looping snarl same edges
    different order'): outer snarl partitions to one set {path0, path1};
    inner snarl separates them."""
    g, forest, part = setup("loop_with_indel_two_paths")
    assert sets_of(g, forest, part, (1, 6), False) == [["path0", "path1"]]
    inner = sets_of(g, forest, part, (2, 4), False)
    assert inner == [["path0"], ["path1"]]


def test_one_node():
    """path_partitioner_unit.cpp:18-45: a one-node graph constructs a
    partitioner without crashing (there is nothing to partition)."""
    g = load_hg(os.path.join(ZOO, "one_node.hg"))
    assert [p.name for p in g.paths] == ["path"]
    part = PathPartitioner(g, g.paths)
    assert len(part.sample_paths) == 1
    forest = find_snarls(g)
    assert len(forest.snarls) == 0          # no snarls in a single node


def test_association_finder_three_node_bubble():
    """path_partitioner_unit.cpp:469-563 at the test_snarls level: the
    three-node bubble with case={path2} through the full association
    finder (exact + chi2), output rows pinned.

    chi2 truth checked by hand: partitions {path0,path1},{path2},{path3}
    give the 2x3 table [[0,0,1],[2,1,0]] -> Pearson stat 4.0, df 2,
    p = exp(-2) = 0.1353; >2 partitions -> Fisher NA
    (stats_test.cpp:362-380)."""
    import io

    from stoat_tpu.graph.association import test_snarls

    g = load_hg(os.path.join(ZOO, "simple_bubble.hg"))
    forest = find_snarls(g)
    part = PathPartitioner(g, g.paths)
    case, control = {"path2"}, {"path0", "path1", "path3"}

    # exact: the {path2} partition equals the case set -> one NA row,
    # no descent (graph_path_association_finder.cpp:100-117)
    buf = io.StringIO()
    n = test_snarls(g, forest, part, case, control, "exact", "tsv", 0,
                    "", buf)
    assert n == 1
    row = buf.getvalue().splitlines()[1].split("\t")
    assert row[3] == "1_5" and row[4] == "1,1"
    assert row[5] == "NA" and row[6] == "NA" and row[7] == "NA"

    # chi2: always writes, per-partition case/control counts
    buf = io.StringIO()
    n = test_snarls(g, forest, part, case, control, "chi2", "tsv", 0,
                    "", buf)
    assert n == 1
    row = buf.getvalue().splitlines()[1].split("\t")
    assert row[3] == "1_5"
    assert row[6] == "0.1353"               # chi2 2x3, stat 4.0, df 2
    assert row[5] == "NA"                   # >2 partitions: Fisher NA
    assert sorted(row[7].split(",")) == ["0:1", "0:2", "1:0"]


def test_native_partition_counts_parity():
    """stoat_graph_partitions == the Python walk-set partitioner on every
    regular snarl of the fixture zoo (counts, order, and representative
    sample)."""
    from stoat_tpu.graph.association import (_NativePartitions,
                                             _is_regular_snarl)

    pytest.importorskip("stoat_tpu.native")
    from stoat_tpu.native import get_graph_lib
    if get_graph_lib() is None:
        pytest.skip("native graph core unavailable")

    for name in ("simple_nested_chain", "simple_bubble",
                 "loop_with_indel", "loop_with_indel_two_paths"):
        g, forest, part = setup(name)
        samples = {p.sample for p in g.paths}
        case = set(sorted(samples)[: len(samples) // 2])
        control = samples - case
        native = _NativePartitions(forest, part, case, control)
        for i, sn in enumerate(forest.snarls):
            if not _is_regular_snarl(g, forest, i):
                continue
            sets = part.partition_samples_in_snarl(forest, i, True)
            want = [(sum(1 for s in p if s in case),
                     sum(1 for s in p if s in control),
                     sorted(p)[0]) for p in sets]
            got = native.counts(i)
            assert got == want, (name, sn.id_str, got, want)
