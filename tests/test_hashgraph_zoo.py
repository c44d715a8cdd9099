"""Decomposition against the reference's REAL .hg fixtures.

Loads the actual bdsg HashGraph files from the reference's fixture zoo via
our native .hg reader and pins the decomposition results against the
expectations hard-coded in the reference's own unit tests
(tests/unittest/snarl_data_t_unit.cpp).  Snarl ids compare as unordered
node pairs (the reference's id orientation is a .dist-index artifact);
path strings compare after orientation normalization.
"""

import os

import pytest

from stoat_tpu.graph.hashgraph import load_hg
from stoat_tpu.graph.decompose import decompose_graph
from stoat_tpu.io.snarl_file import parse_path_string

ZOO = "/root/reference/tests/graph_test"

pytestmark = pytest.mark.skipif(not os.path.isdir(ZOO),
                                reason="reference fixtures unavailable")


def rc_path(path_str):
    nodes = parse_path_string(path_str)
    return "".join(("<" if not rev else ">") + str(nid)
                   for nid, rev in reversed(nodes))


def norm(path_str):
    return min(path_str, rc_path(path_str))


def run(name, cycle_threshold):
    g = load_hg(os.path.join(ZOO, f"{name}.hg"), {"ref"})
    return decompose_graph(g, {"ref"}, cycle_threshold=cycle_threshold)


def get(chr_map, pair):
    for s in chr_map["ref"]:
        if frozenset(s.snarl_ids) == frozenset(pair):
            return s
    raise AssertionError(
        f"snarl {pair} not found in "
        f"{[s.snarl_id_str for s in chr_map['ref']]}")


def check(s, paths_types, start=None, end=None):
    got = {norm(p): t for p, t in zip(s.path_strings, s.type_variants)}
    want = {norm(p): t for p, t in paths_types.items()}
    assert got == want, (s.snarl_id_str, got, want)
    if start is not None:
        assert s.start_pos == start, s.snarl_id_str
    if end is not None:
        assert s.end_pos == end, s.snarl_id_str


def test_simple_snp():
    cm = run("simple_snp", 0)
    assert len(cm["ref"]) == 1
    check(get(cm, (2, 5)), {">2>3>5": "1", ">2>4>5": "1"}, 8, 9)


def test_3th_snp():
    cm = run("3th_snp", 0)
    assert len(cm["ref"]) == 1
    check(get(cm, (2, 6)),
          {">2>3>6": "1", ">2>4>6": "1", ">2>5>6": "1"}, 8, 9)


def test_4th():
    cm = run("4th", 0)
    assert len(cm["ref"]) == 1
    check(get(cm, (2, 7)),
          {">2>3>5>7": "4", ">2>4>6>7": "6", ">2>3>6>7": "5"}, 8, 12)


def test_deletion_snp():
    cm = run("deletion_snp", 0)
    assert len(cm["ref"]) == 1
    check(get(cm, (2, 4)), {">2>4": "0", ">2>3>4": "1"}, 8, 9)


def test_insert_deletion():
    cm = run("insert_deletion", 0)
    assert len(cm["ref"]) == 1
    check(get(cm, (2, 4)), {">2>4": "0", ">2>3>4": "3"}, 8, 11)


def test_insert_snp():
    cm = run("insert_snp", 0)
    assert len(cm["ref"]) == 1
    check(get(cm, (2, 5)), {">2>3>5": "1", ">2>4>5": "3"}, 8, 9)


def test_inversion():
    cm = run("inversion", 0)
    assert len(cm["ref"]) == 2
    check(get(cm, (2, 6)), {">2>6": "0", ">2>3>0>5>6": "6"}, 8, 14)
    check(get(cm, (3, 5)), {">3>4>5": "2", ">3<4>5": "2"}, 9, 11)


def test_large_del():
    cm = run("large_del", 0)
    assert len(cm["ref"]) == 3
    check(get(cm, (2, 9)), {">2>9": "0", ">2>3>0>8>9": "9/10"}, 8, 8)
    check(get(cm, (6, 8)), {">6>8": "0", ">6>7>8": "1"}, 8, 8)
    check(get(cm, (3, 6)), {">3>5>6": "1", ">3>4>6": "1"}, 8, 8)


def test_loop_simple():
    cm = run("loop_simple", 1)
    assert len(cm["ref"]) == 1
    check(get(cm, (2, 5)),
          {">2>3>5": "1", ">2>3>3>5": "2", ">2>4>5": "2"}, 8, 9)


def test_loop():
    cm = run("loop", 2)
    assert len(cm["ref"]) == 1
    check(get(cm, (1, 5)), {
        ">1>2>3>5": "5", ">1>2>3>2>3>5": "10", ">1>2>3>2>3>2>3>5": "15",
        ">1>2>3>2>3>2>4>5": "16", ">1>2>3>2>4>5": "11", ">1>2>4>5": "6",
    }, 4, 9)


def test_loop_double():
    cm = run("loop_double", 2)
    assert len(cm["ref"]) == 1
    check(get(cm, (2, 7)), {
        ">2>3>4>5>7": "10", ">2>3>4>5>3>4>5>7": "20",
        ">2>3>4>5>3>4>5>3>4>5>7": "30", ">2>3>4>5>3>4>3>4>5>7": "28",
        ">2>3>4>3>4>5>7": "18", ">2>3>4>3>4>5>3>4>5>7": "28",
        ">2>3>4>3>4>3>4>5>7": "26", ">2>6>7": "2",
    }, 8, 10)


def test_loop_plus():
    cm = run("loop_plus", 1)
    assert len(cm["ref"]) == 2
    check(get(cm, (2, 8)), {
        ">2>3>0>6>8": "3/4", ">2>3>0>6>3>0>6>8": "6/8", ">2>7>8": "1",
    }, 8, 9)
    check(get(cm, (3, 6)), {">3>5>6": "2", ">3>4>6": "1"}, 8, 9)


def test_repetition():
    cm = run("repetition", 0)
    assert len(cm["ref"]) == 1
    check(get(cm, (2, 6)), {
        ">2>6": "0", ">2>3>6": "3", ">2>3>4>6": "6", ">2>3>4>5>6": "9",
    }, 8, 8)


def test_complex_ins():
    cm = run("complex_ins", 0)
    assert len(cm["ref"]) == 1
    check(get(cm, (2, 8)), {
        ">2>8": "0", ">2>3>4>6>8": "3", ">2>3>5>6>8": "3",
        ">2>3>5>7>8": "3", ">2>7>8": "1",
    }, 8, 9)


def test_snp_and_nested_snp():
    cm = run("snp_and_nested_snp", 0)
    assert len(cm["ref"]) == 2
    check(get(cm, (2, 8)), {">2>3>0>6>8": "3/4", ">2>7>8": "1"}, 8, 9)
    check(get(cm, (3, 6)), {">3>4>6": "1", ">3>5>6": "2"}, 8, 9)


def test_nested_plus():
    cm = run("nested_plus", 0)
    assert len(cm["ref"]) == 2
    check(get(cm, (2, 8)), {
        ">2>8": "0", ">2>3>0>6>7>8": "5", ">2>3>0>6>8": "4"}, 8, 12)
    check(get(cm, (3, 6)), {">3>5>6": "2", ">3>4>6": "2"}, 9, 11)
