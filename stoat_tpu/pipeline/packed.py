"""Bit-packed membership path for large cohorts.

The default membership op (pipeline/membership.py) gathers float32 rows of
the [E, H] edge matrix — 4 bytes per haplotype bit.  At biobank scale that
is the difference between fitting and not fitting: 16k edges × 200k
haplotypes is 12.8 GB as f32 but 100 MB bit-packed, and the per-path
gather traffic shrinks by the same 32×.

This module packs the edge matrix into uint32 words (32 haplotypes per
word, little bit order: bit j of word w = haplotype 32·w+j) and computes
membership as a bitwise AND-reduction over each path's edge rows —
exactly identify_path's "every edge bit set" semantics
(/root/reference/src/snarl_analyzer.cpp:343-354) evaluated 32 haplotypes
per VPU lane element.  Carrier counts for the binary pipeline then come
straight off the packed words via population counts, never materializing
a [P, H] float matrix.

Two device implementations, value-identical (pinned by tests):

  * ``membership_words`` — pure XLA: one gather + ``lax.reduce`` with a
    bitwise-AND monoid.
  * ``membership_words_pallas`` — a Pallas TPU kernel that fuses the
    gather into the reduction via scalar-prefetched row indices: each
    grid step DMAs exactly one [1, W] row straight into the AND
    accumulator, so the [P, K, W] gathered intermediate never exists.

Padding contract: edge-row index ``E`` (one past the real rows) is the
AND identity — the packed table carries an extra all-ones row at the
bottom, and per-path edge lists are padded with ``E``.  Zero-edge valid
paths therefore match every haplotype (vacuous AND, as in the
reference); ``path_valid`` masking and the tail-bit mask (haplotypes
beyond H in the last word) are applied after the reduction.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

from stoat_tpu import jaxconfig  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "pack_matrix_words",
    "pack_path_edge_idx",
    "pack_hap_mask_words",
    "tail_mask_words",
    "membership_words",
    "membership_words_pallas",
    "packed_binary_counts",
    "unpack_membership",
]

_WORD = 32


def _n_words(n_haplotypes: int, lane_multiple: int = 1) -> int:
    w = (n_haplotypes + _WORD - 1) // _WORD
    if lane_multiple > 1:
        w = ((w + lane_multiple - 1) // lane_multiple) * lane_multiple
    return max(w, lane_multiple)


def pack_matrix_words(matrix: np.ndarray,
                      lane_multiple: int = 1) -> np.ndarray:
    """Pack a bool [E, H] edge matrix into uint32 [E+1, W] words.

    The appended final row is all-ones: the AND identity used as the
    padding target by ``pack_path_edge_idx``.  ``lane_multiple`` pads W
    up (e.g. to 128 for the Pallas kernel's lane dimension).
    """
    E, H = matrix.shape
    W = _n_words(H, lane_multiple)
    u8 = np.packbits(np.asarray(matrix, bool), axis=1, bitorder="little")
    buf = np.zeros((E + 1, W * 4), np.uint8)
    buf[:E, : u8.shape[1]] = u8
    buf[E, :] = 0xFF
    return buf.view("<u4").reshape(E + 1, W)


def pack_hap_mask_words(mask: np.ndarray, n_words: int) -> np.ndarray:
    """Pack a bool [H] haplotype mask into uint32 [W] words."""
    u8 = np.packbits(np.asarray(mask, bool), bitorder="little")
    buf = np.zeros(n_words * 4, np.uint8)
    buf[: u8.shape[0]] = u8
    return buf.view("<u4")


def tail_mask_words(n_haplotypes: int, n_words: int) -> np.ndarray:
    """uint32 [W] mask with exactly the first ``n_haplotypes`` bits set."""
    return pack_hap_mask_words(np.ones(n_haplotypes, bool), n_words)


def pack_path_edge_idx(coo_path: np.ndarray, coo_row: np.ndarray,
                       path_valid: np.ndarray, n_rows: int,
                       min_k: int = 1) -> np.ndarray:
    """Convert the COO (path, edge-row) list into padded [P, K] indices.

    K = max edges on any valid path (≥ ``min_k``); padding entries point
    at row ``n_rows`` — the all-ones AND-identity row appended by
    ``pack_matrix_words``.  COO entries on invalid paths (these are
    exactly the pack-time padding entries; real unresolved-edge paths
    had their entries dropped during packing) are discarded so they
    cannot inflate K.
    """
    P = path_valid.shape[0]
    real = path_valid[coo_path]
    cp = coo_path[real].astype(np.int64)
    cr = coo_row[real].astype(np.int32)
    counts = np.bincount(cp, minlength=P)
    K = max(min_k, int(counts.max()) if counts.size else min_k)
    # round K to a power of two: chunks of one chromosome then share the
    # [P, K] shape and the jitted membership graph compiles once (padding
    # gathers all hit the same AND-identity row)
    k2 = 1
    while k2 < K:
        k2 *= 2
    K = k2
    idx = np.full((P, K), n_rows, np.int32)
    order = np.argsort(cp, kind="stable")
    cp, cr = cp[order], cr[order]
    starts = np.zeros(P + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    col = np.arange(cp.shape[0]) - starts[cp]
    idx[cp, col] = cr
    return idx


@jax.jit
def membership_words(words, idx):
    """[P, W] packed membership: bitwise AND over each path's edge rows.

    Runs as a K-step AND-accumulation (one [P, W] gather per step) rather
    than one [P, K, W] gather + reduce: XLA materializes the latter's
    intermediate, which OOMs at biobank shapes (e.g. 26 GB at P=64k,
    K=16, H=200k), while the loop keeps only the [P, W] accumulator live.

    Args:
      words: [E+1, W] uint32 — packed matrix, last row all-ones.
      idx:   [P, K] int32 — edge rows per path, padded with E.
    """
    K = idx.shape[1]

    def step(k, acc):
        return acc & jnp.take(words, idx[:, k], axis=0)

    init = jnp.take(words, idx[:, 0], axis=0)                # [P, W]
    return jax.lax.fori_loop(1, K, step, init)


def membership_words_pallas(words, idx, *, interpret: bool = False):
    """Pallas fused gather-AND membership (TPU).

    The packed table stays in HBM; each grid step owns a tile of paths,
    reads its edge-row indices from an SMEM block, and double-buffers
    per-row HBM→VMEM DMAs straight into a bitwise-AND accumulator.  The
    [P, K, W] gathered intermediate of the XLA version never
    materializes, and each table row is read exactly once per reference.
    W must be a multiple of 128 (pack with ``lane_multiple=128``).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, K = idx.shape
    E1, W = words.shape
    TILE_P = 8
    P_pad = ((P + TILE_P - 1) // TILE_P) * TILE_P
    if P_pad != P:
        pad = jnp.full((P_pad - P, K), E1 - 1, idx.dtype)
        idx = jnp.concatenate([idx, pad], axis=0)

    # Rows must be DMA-able as whole (8, 128) tiles: lay the table out as
    # [rows, W/128, 128] with W/128 a multiple of 8, so a single-row slice
    # rides the untiled leading dimension.
    LANES, SUBL = 128, 8
    Wt = ((W + LANES - 1) // LANES + SUBL - 1) // SUBL * SUBL
    W_pad = Wt * LANES
    if W_pad != W:
        words = jnp.pad(words, ((0, 0), (0, W_pad - W)))
    words3 = words.reshape(E1, Wt, LANES)

    def kernel(idx_ref, words_ref, out_ref, row_buf, acc, sems):
        # all index math in int32: x64 mode would otherwise promote the
        # loop counter to i64, which Mosaic does not support
        total = jnp.int32(TILE_P * K)
        K32, two = jnp.int32(K), jnp.int32(2)

        def dma(slot, t):
            i, k = jax.lax.div(t, K32), jax.lax.rem(t, K32)
            row = idx_ref[i, k]
            return pltpu.make_async_copy(
                words_ref.at[pl.ds(row, 1)],
                row_buf.at[pl.ds(slot, 1)],
                sems.at[slot])

        dma(jnp.int32(0), jnp.int32(0)).start()

        def body(t, carry):
            slot = jax.lax.rem(t, two)

            @pl.when(t + jnp.int32(1) < total)
            def _():
                dma(jax.lax.rem(t + jnp.int32(1), two),
                    t + jnp.int32(1)).start()

            dma(slot, t).wait()
            i, k = jax.lax.div(t, K32), jax.lax.rem(t, K32)

            @pl.when(k == 0)
            def _():
                acc[...] = row_buf[pl.ds(slot, 1)]

            @pl.when(k != 0)
            def _():
                acc[...] = acc[...] & row_buf[pl.ds(slot, 1)]

            @pl.when(k == K32 - 1)
            def _():
                out_ref[pl.ds(i, 1)] = acc[...]

            return carry

        jax.lax.fori_loop(jnp.int32(0), total, body, jnp.int32(0))

    out = pl.pallas_call(
        kernel,
        grid=(P_pad // TILE_P,),
        in_specs=[
            pl.BlockSpec((TILE_P, K),
                         lambda p: (p, jnp.int32(0)),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (TILE_P, Wt, LANES),
            lambda p: (p, jnp.int32(0), jnp.int32(0))),
        scratch_shapes=[
            pltpu.VMEM((2, Wt, LANES), jnp.uint32),
            pltpu.VMEM((1, Wt, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=jax.ShapeDtypeStruct((P_pad, Wt, LANES), jnp.uint32),
        interpret=interpret,
    )(idx, words3)
    return out.reshape(P_pad, W_pad)[:P, :W]


@jax.jit
def packed_binary_counts(mem_words, path_valid, tail, g1_words):
    """Per-path (g0, g1) carrier counts from packed membership words.

    g1 = carriers among case haplotypes (``g1_words`` packed mask),
    g0 = carriers among the rest; equivalent to the f32 path's
    ``membership @ pheno_onehot`` matmuls but via population counts.
    """
    mem = jnp.where(path_valid[:, None], mem_words & tail[None, :],
                    jnp.uint32(0))
    g1 = jnp.sum(jax.lax.population_count(mem & g1_words[None, :]),
                 axis=-1)
    g_all = jnp.sum(jax.lax.population_count(mem), axis=-1)
    return (g_all - g1).astype(jnp.float64), g1.astype(jnp.float64)


@partial(jax.jit, static_argnames=("n_haplotypes",))
def unpack_membership(mem_words, path_valid, n_haplotypes: int):
    """Expand packed membership words to the bool [P, H] matrix.

    Used by the quantitative path when the packed gather is preferred:
    the expensive per-edge gather runs at 1 bit/haplotype, only the
    final membership expands to H lanes.
    """
    P, W = mem_words.shape
    shifts = jnp.arange(_WORD, dtype=jnp.uint32)
    bits = (mem_words[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    full = bits.reshape(P, W * _WORD)[:, :n_haplotypes] != 0
    return full & path_valid[:, None]
