"""Bit-packed membership parity: packed words vs the f32 gather path.

The packed path (pipeline/packed.py) must reproduce identify_path's
semantics (snarl_analyzer.cpp:315-356) exactly as the f32 path does:
zero-edge valid paths match every haplotype, invalid paths match none,
and binary carrier counts match the membership×phenotype matmuls.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stoat_tpu.pipeline.membership import path_membership
from stoat_tpu.pipeline import packed as pk


def _random_case(seed, E=37, H=101, P=23, max_k=5):
    rng = np.random.default_rng(seed)
    matrix = rng.random((E, H)) < 0.4
    n_edges = rng.integers(0, max_k + 1, P).astype(np.int32)
    valid = rng.random(P) < 0.9
    # COO with arbitrary interleaving; invalid paths also get entries
    # (mirrors pack-time padding pointing at invalid slots).
    coo_path, coo_row = [], []
    for p in range(P):
        k = n_edges[p] if valid[p] else rng.integers(0, max_k + 1)
        for _ in range(k):
            coo_path.append(p)
            coo_row.append(rng.integers(0, E))
    coo_path = np.array(coo_path, np.int32)
    coo_row = np.array(coo_row, np.int32)
    order = rng.permutation(coo_path.shape[0])
    coo_path, coo_row = coo_path[order], coo_row[order]
    # keep n_edges consistent with the real entries of valid paths
    n_edges = np.bincount(coo_path[valid[coo_path]],
                          minlength=P).astype(np.int32)
    return matrix, coo_path, coo_row, n_edges, valid


def _f32_membership(matrix, coo_path, coo_row, n_edges, valid):
    # reference device path: drop invalid paths' entries like pack time
    keep = valid[coo_path]
    return np.asarray(path_membership(
        jnp.asarray(matrix, jnp.float32),
        jnp.asarray(coo_path[keep]), jnp.asarray(coo_row[keep]),
        jnp.asarray(n_edges), jnp.asarray(valid),
        int(n_edges.shape[0])))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_packed_membership_matches_f32(seed):
    matrix, coo_path, coo_row, n_edges, valid = _random_case(seed)
    E, H = matrix.shape

    words = pk.pack_matrix_words(matrix)
    idx = pk.pack_path_edge_idx(coo_path, coo_row, valid, E)
    mem_words = pk.membership_words(jnp.asarray(words), jnp.asarray(idx))
    got = np.asarray(pk.unpack_membership(
        mem_words, jnp.asarray(valid), H))

    want = _f32_membership(matrix, coo_path, coo_row, n_edges, valid)
    np.testing.assert_array_equal(got, want)


def test_zero_edge_valid_path_matches_all():
    matrix = np.zeros((3, 10), bool)
    valid = np.array([True, False])
    coo_path = np.zeros(0, np.int32)
    coo_row = np.zeros(0, np.int32)
    words = pk.pack_matrix_words(matrix)
    idx = pk.pack_path_edge_idx(coo_path, coo_row, valid, 3)
    mem = np.asarray(pk.unpack_membership(
        pk.membership_words(jnp.asarray(words), jnp.asarray(idx)),
        jnp.asarray(valid), 10))
    assert mem[0].all()          # vacuous AND
    assert not mem[1].any()      # invalid path


@pytest.mark.parametrize("seed", [3, 4])
def test_packed_binary_counts_match_matmul(seed):
    matrix, coo_path, coo_row, n_edges, valid = _random_case(seed)
    E, H = matrix.shape
    rng = np.random.default_rng(seed + 100)
    pheno = rng.random(H) < 0.5

    words = pk.pack_matrix_words(matrix)
    idx = pk.pack_path_edge_idx(coo_path, coo_row, valid, E)
    mem_words = pk.membership_words(jnp.asarray(words), jnp.asarray(idx))
    tail = pk.tail_mask_words(H, words.shape[1])
    g1w = pk.pack_hap_mask_words(pheno, words.shape[1])
    g0, g1 = pk.packed_binary_counts(mem_words, jnp.asarray(valid),
                                     jnp.asarray(tail), jnp.asarray(g1w))

    mem = _f32_membership(matrix, coo_path, coo_row, n_edges, valid)
    np.testing.assert_array_equal(np.asarray(g1),
                                  mem.astype(np.int64) @ pheno)
    np.testing.assert_array_equal(np.asarray(g0),
                                  mem.astype(np.int64) @ ~pheno)


@pytest.mark.parametrize("seed", [5, 6, 7])
def test_delta_compressed_idx_upload_matches_raw(seed):
    """upload_path_idx's delta compression (pads rewritten to repeat the
    previous row — AND-idempotent) must be membership-value-identical to
    the raw int32 index, and upload_snarl_path_idx must round-trip."""
    matrix, coo_path, coo_row, n_edges, valid = _random_case(
        seed, E=23, H=97, P=19)
    E, H = matrix.shape
    words = pk.pack_matrix_words(matrix)
    idx = pk.pack_path_edge_idx(coo_path, coo_row, valid, E)
    dev = pk.upload_path_idx(idx, E)
    want = np.asarray(pk.membership_words(jnp.asarray(words),
                                          jnp.asarray(idx)))
    got = np.asarray(pk.membership_words(jnp.asarray(words), dev))
    np.testing.assert_array_equal(got, want)

    # [S, Pmax] with -1 padding (the tables.py layout) must round-trip
    # through the u16 sentinel encoding
    rng2 = np.random.default_rng(seed)
    sidx = rng2.integers(0, 19, (7, 4)).astype(np.int64)
    sidx[rng2.random((7, 4)) < 0.4] = -1
    np.testing.assert_array_equal(
        np.asarray(pk.upload_snarl_path_idx(sidx)), sidx)
    # wide chunk (indices beyond u16): raw int32 fallback, still exact
    wide = sidx.copy()
    wide[0, 0] = 70000
    np.testing.assert_array_equal(
        np.asarray(pk.upload_snarl_path_idx(wide)), wide)


def test_pipeline_packed_vs_dense_end_to_end(tmp_path):
    """Full binary pipeline parity: packed words vs f32 membership."""
    from fixtures import make_fixture
    from stoat_tpu.io.snarl_file import parse_snarl_path
    from stoat_tpu.io.vcf import VcfReader
    from stoat_tpu.io.phenotype import parse_binary_pheno
    from stoat_tpu.matrix import EdgeHaplotypeMatrix
    from stoat_tpu.pipeline.binary import binary_analyze_chromosome
    from stoat_tpu.tables import pack_chromosome

    paths = make_fixture(str(tmp_path), n_samples=50, n_snarls=30, seed=9)
    reader = VcfReader(paths["vcf"])
    _, records = next(iter(reader.chromosome_chunks()))
    matrix = EdgeHaplotypeMatrix(2 * len(paths["samples"]))
    for rec in records:
        matrix.add_record(rec)
    snarls = parse_snarl_path(paths["snarl"])["ref"]
    pheno, _ = parse_binary_pheno(paths["binary"], list(paths["samples"]))
    packed = pack_chromosome(snarls, matrix)

    dense = binary_analyze_chromosome(packed, pheno, 3, 5, 0.05,
                                      use_packed=False)
    bits = binary_analyze_chromosome(packed, pheno, 3, 5, 0.05,
                                     use_packed=True)
    for key in dense:
        np.testing.assert_array_equal(
            np.asarray(dense[key]), np.asarray(bits[key]),
            err_msg=f"mismatch in {key}")
