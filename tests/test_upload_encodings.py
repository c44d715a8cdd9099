"""Property tests for the wire codecs (round-5 uplink compression).

Every upload helper in pipeline/packed.py and the dedup reconstruction
must be VALUE-IDENTICAL to the raw upload it replaces — these fuzz the
encoders across widths, paddings, and fallback boundaries.  (The
streamed-words dedup additionally has integration pins in
test_native_core.py.)
"""

import numpy as np

from stoat_tpu.pipeline import packed as _pk
from stoat_tpu.pipeline.runner import upload_words_dedup


def test_upload_path_idx_membership_identical():
    """Delta/base-delta/raw tiers: the reconstructed index must give the
    same AND-membership as the raw index (pads rewritten to repeats are
    AND-idempotent by design)."""
    rng = np.random.default_rng(0)
    for _trial in range(40):
        P = int(rng.integers(1, 300))
        K = int(2 ** rng.integers(0, 4))
        n_rows = int(rng.integers(5, 50000))
        idx = np.full((P, K), n_rows, np.int32)
        for p in range(P):
            ne = int(rng.integers(0, K + 1))
            idx[p, :ne] = np.sort(rng.integers(0, n_rows, size=ne))
        got = np.asarray(_pk.upload_path_idx(idx, n_rows))
        words = rng.integers(0, 2 ** 32, size=(n_rows + 1, 3),
                             dtype=np.uint32)
        words[n_rows] = 0xFFFFFFFF
        m_raw = np.bitwise_and.reduce(words[idx], axis=1)
        m_got = np.bitwise_and.reduce(words[got], axis=1)
        np.testing.assert_array_equal(m_raw, m_got)


def test_upload_snarl_path_idx_roundtrip_and_fallback():
    rng = np.random.default_rng(1)
    for _trial in range(40):
        S = int(rng.integers(1, 200))
        pmax = int(2 ** rng.integers(1, 4))
        counts = rng.integers(0, pmax + 1, size=S)
        starts = np.cumsum(counts) - counts
        sidx = np.full((S, pmax), -1, np.int64)
        for s in range(S):
            sidx[s, :counts[s]] = np.arange(starts[s],
                                            starts[s] + counts[s])
        got = np.asarray(_pk.upload_snarl_path_idx(sidx))
        np.testing.assert_array_equal(got, sidx)
    # non-consecutive layout must fall back, not mangle
    sidx = np.array([[0, 2], [1, -1]])
    np.testing.assert_array_equal(
        np.asarray(_pk.upload_snarl_path_idx(sidx)), sidx)


def test_upload_bool_bits_roundtrip():
    rng = np.random.default_rng(2)
    for n in (1, 10, 4095, 4096, 4097, 9999):
        m = rng.random(n) < 0.3
        np.testing.assert_array_equal(
            np.asarray(_pk.upload_bool_bits(m)), m)


def test_gather_dedup_reconstruction():
    rng = np.random.default_rng(3)
    for _trial in range(20):
        n = int(rng.integers(1, 500))
        W = int(rng.integers(1, 8))
        # rows with runs of duplicates (the VCF shape)
        base = rng.integers(0, 2 ** 32, size=(max(n // 3, 1), W),
                            dtype=np.uint32)
        reps = rng.integers(1, 5, size=base.shape[0])
        rows = np.repeat(base, reps, axis=0)[:n]
        if rows.shape[0] < n:
            rows = np.vstack([rows] * (n // rows.shape[0] + 1))[:n]
        new = np.empty(n, bool)
        new[0] = True
        np.any(rows[1:] != rows[:-1], axis=1, out=new[1:])
        import jax.numpy as jnp
        got = np.asarray(_pk.gather_dedup(jnp.asarray(rows[new]), new, n))
        np.testing.assert_array_equal(got, rows)


def test_upload_words_dedup_value_identical():
    rng = np.random.default_rng(4)
    # compressible (runs) and incompressible (random) inputs
    base = rng.integers(0, 2 ** 32, size=(200, 5), dtype=np.uint32)
    runs = np.repeat(base, 3, axis=0)
    rnd = rng.integers(0, 2 ** 32, size=(300, 5), dtype=np.uint32)
    for words in (runs, rnd, rnd[:8]):
        np.testing.assert_array_equal(
            np.asarray(upload_words_dedup(words)), words)
