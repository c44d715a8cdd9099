"""Mesh construction and snarl-axis sharding of packed chromosomes.

Sharding layout (SURVEY.md §5.8 / BASELINE north star):
  - 1-D mesh over all devices, axis name "snarls"
  - per-snarl batch arrays sharded along the leading shard axis
  - the edge×haplotype matrix, phenotype, and covariates replicated
  - results are independent per snarl: the only cross-device data movement
    is the implicit gather when the host fetches outputs; BH post-
    processing needs the global p-vector and runs on host 0.

Every shard is padded to identical shapes (snarl, path, and COO axes) so
one compiled program serves all devices.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh

from stoat_tpu.io.snarl_file import SnarlData
from stoat_tpu.matrix import EdgeHaplotypeMatrix
from stoat_tpu.tables import (PackedChromosome, next_pow2, pack_chromosome,
                              repad_for_coo_collision)

__all__ = ["make_snarl_mesh", "shard_packed_chromosome", "ShardedChromosome"]


def make_snarl_mesh(devices: Optional[Sequence] = None,
                    n_devices: Optional[int] = None) -> Mesh:
    """A 1-D mesh over the snarl axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("snarls",))


@dataclass
class ShardedChromosome:
    """Per-device stacked arrays: leading axis = shard.

    The edge×haplotype matrix is carried bit-packed (``words``, uint32
    [E+1, W] in the device kernels' layout, replicated across shards) and
    each shard's path→edge-row references are pre-padded [P, K] indices
    into it (``path_idx``, padding = the AND-identity row E).  The raw
    COO arrays are kept for callers that build their own layouts; the
    dense bool matrix is derived lazily for legacy paths only.
    """

    words: np.ndarray             # [E+1, W] uint32 (replicated)
    n_haps: int                   # real haplotype count
    path_idx: np.ndarray          # [D, P, K] int32 — rows per path
    coo_path: np.ndarray          # [D, nnz]
    coo_row: np.ndarray           # [D, nnz]
    n_edges_per_path: np.ndarray  # [D, P]
    path_valid: np.ndarray        # [D, P]
    snarl_path_idx: np.ndarray    # [D, S_local, Pmax]
    n_snarls: int                 # real total snarls
    snarls: List[SnarlData]
    shard_sizes: List[int]        # real snarls per shard
    _dense: Optional[np.ndarray] = None

    @property
    def n_shards(self) -> int:
        return self.coo_path.shape[0]

    @property
    def paths_per_shard(self) -> int:
        return self.n_edges_per_path.shape[1]

    @property
    def matrix(self) -> np.ndarray:
        """Dense bool [E, H] view (lazy; prefer ``words``)."""
        if self._dense is None:
            from stoat_tpu.pipeline.packed import unpack_words_to_dense
            self._dense = unpack_words_to_dense(self.words, self.n_haps)
        return self._dense


def shard_packed_chromosome(snarls: Sequence[SnarlData],
                            edge_matrix: EdgeHaplotypeMatrix,
                            n_shards: int) -> ShardedChromosome:
    """Split a chromosome's snarls into contiguous per-device chunks and
    pack each with identical padded shapes."""
    S_real = len(snarls)
    per = -(-max(S_real, 1) // n_shards)  # ceil
    chunks = [list(snarls[i * per:(i + 1) * per]) for i in range(n_shards)]
    packs = [pack_chromosome(c, edge_matrix, pad_snarls=False)
             if c else None for c in chunks]

    # Common padded shapes across shards
    S_local = next_pow2(per)
    Pmax = next_pow2(max((p.snarl_path_idx.shape[1] for p in packs
                          if p is not None), default=2))
    P = next_pow2(max((p.n_edges_per_path.shape[0] for p in packs
                       if p is not None), default=1))
    nnz = next_pow2(max((p.coo_path.shape[0] for p in packs
                         if p is not None), default=1))
    P = repad_for_coo_collision(P, nnz, packs)

    def pad_shard(p: Optional[PackedChromosome]):
        coo_p = np.full(nnz, P - 1, np.int32)
        coo_r = np.zeros(nnz, np.int32)
        n_e = np.zeros(P, np.int32)
        valid = np.zeros(P, bool)
        idx = np.full((S_local, Pmax), -1, np.int32)
        if p is not None:
            n = p.coo_path.shape[0]
            coo_p[:n] = p.coo_path
            coo_r[:n] = p.coo_row
            # Re-point this shard's own COO padding at the common padded slot
            coo_p[coo_p >= p.n_paths] = P - 1
            n_e[: p.n_edges_per_path.shape[0]] = p.n_edges_per_path
            valid[: p.path_valid.shape[0]] = p.path_valid
            valid[p.n_paths:] = False
            s, pm = p.snarl_path_idx.shape
            idx[:s, :pm] = p.snarl_path_idx
        return coo_p, coo_r, n_e, valid, idx

    padded = [pad_shard(p) for p in packs]

    # Bit-packed words: straight from a native PackedEdgeMatrix, else
    # packed once on host from the dense bool matrix.
    words = getattr(edge_matrix, "words", None)
    if words is None:
        from stoat_tpu.pipeline.packed import pack_matrix_words
        matrix = edge_matrix.shrink()
        if matrix.shape[0] == 0:
            matrix = np.zeros((1, matrix.shape[1]), bool)
        words = pack_matrix_words(matrix)
    n_rows = words.shape[0] - 1

    # Per-shard [P, K] path->edge-row indices with one K across shards
    # (pack_path_edge_idx rounds K to pow2, so shards agree by taking
    # the max).
    from stoat_tpu.pipeline.packed import pack_path_edge_idx
    idx_shards = [pack_path_edge_idx(x[0], x[1], x[3], n_rows)
                  for x in padded]
    K = max(ix.shape[1] for ix in idx_shards)
    path_idx = np.stack([
        np.pad(ix, ((0, 0), (0, K - ix.shape[1])),
               constant_values=n_rows) for ix in idx_shards])

    return ShardedChromosome(
        words=words,
        n_haps=edge_matrix.n_haplotypes,
        path_idx=path_idx,
        coo_path=np.stack([x[0] for x in padded]),
        coo_row=np.stack([x[1] for x in padded]),
        n_edges_per_path=np.stack([x[2] for x in padded]),
        path_valid=np.stack([x[3] for x in padded]),
        snarl_path_idx=np.stack([x[4] for x in padded]),
        n_snarls=S_real,
        snarls=list(snarls),
        shard_sizes=[len(c) for c in chunks],
    )
