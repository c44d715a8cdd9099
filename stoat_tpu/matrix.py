"""Edge×haplotype genotype matrix construction.

TPU-native re-design of the reference's packed bit matrix
(/root/reference/src/matrix.{hpp,cpp}) and its VCF ingestion loop
(``make_edge_matrix``, snarl_analyzer.cpp:190-260): one matrix per
chromosome, rows keyed by graph edges (oriented node pairs), columns =
haplotypes (2 per sample).  Instead of per-bit scalar writes we set whole
(edge-rows × haplotype-columns) blocks per VCF record with vectorized numpy
writes; the matrix ships to the device as float32 where path membership
becomes one batched matmul/segment-sum instead of the reference's innermost
bit-scan loop (``identify_path``, snarl_analyzer.cpp:315-356).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

from stoat_tpu.io.snarl_file import Edge, NodeTraversal, parse_path_string
from stoat_tpu.io.vcf import VcfRecord

__all__ = ["EdgeHaplotypeMatrix", "decompose_path_str_to_edges"]


def decompose_path_str_to_edges(path_str: str) -> List[Edge]:
    """``>123>213<234`` -> [((123,F),(213,F)), ((213,F),(234,T))]
    (snarl_analyzer.cpp:277-303)."""
    nodes = parse_path_string(path_str)
    return [(nodes[i], nodes[i + 1]) for i in range(len(nodes) - 1)]


class EdgeHaplotypeMatrix:
    """Dense boolean edge×haplotype matrix with edge-row interning.

    Row growth uses amortized doubling like the reference (matrix.cpp:59-64);
    ``shrink()`` trims to the populated rows (matrix.cpp:86-91).
    """

    def __init__(self, n_haplotypes: int, initial_rows: int = 256):
        self.n_haplotypes = n_haplotypes
        self.edge_to_row: Dict[Edge, int] = {}
        self._data = np.zeros((max(initial_rows, 1), n_haplotypes), dtype=bool)

    @property
    def n_rows(self) -> int:
        return len(self.edge_to_row)

    def _ensure_rows(self, needed: int) -> None:
        if needed > self._data.shape[0]:
            new_rows = self._data.shape[0]
            while new_rows < needed:
                new_rows *= 2
            grown = np.zeros((new_rows, self.n_haplotypes), dtype=bool)
            grown[: self._data.shape[0]] = self._data
            self._data = grown

    def intern_edge(self, edge: Edge) -> int:
        row = self.edge_to_row.get(edge)
        if row is None:
            row = len(self.edge_to_row)
            self.edge_to_row[edge] = row
            self._ensure_rows(row + 1)
        return row

    def find_edge(self, edge: Edge) -> int:
        """Row index or -1 (reference returns size_t::max; matrix.cpp)."""
        return self.edge_to_row.get(edge, -1)

    def add_record(self, rec: VcfRecord) -> None:
        """Ingest one VCF record: set every edge of each called allele's
        traversal for the corresponding haplotype column
        (snarl_analyzer.cpp:237-253)."""
        if not rec.at_paths:
            return
        alleles = rec.alleles
        for allele_idx, path_str in enumerate(rec.at_paths):
            cols = np.nonzero(alleles == allele_idx)[0]
            if cols.size == 0:
                continue
            edges = decompose_path_str_to_edges(path_str)
            if not edges:
                continue
            rows = np.array([self.intern_edge(e) for e in edges],
                            dtype=np.int64)
            self._data[np.ix_(rows, cols)] = True

    def shrink(self) -> np.ndarray:
        """Return the populated [n_edges, n_haplotypes] boolean matrix."""
        return self._data[: self.n_rows]

    @classmethod
    def from_records(cls, records: Iterable[VcfRecord],
                     n_haplotypes: int,
                     initial_rows: int = 256) -> "EdgeHaplotypeMatrix":
        m = cls(n_haplotypes, initial_rows)
        for rec in records:
            m.add_record(rec)
        return m


class PrebuiltEdgeMatrix:
    """Adapter over a matrix + edge map built by the native C++ core."""

    def __init__(self, matrix: np.ndarray, edge_to_row: Dict[Edge, int]):
        self._matrix = matrix
        self.edge_to_row = edge_to_row
        self.n_haplotypes = matrix.shape[1]

    @property
    def n_rows(self) -> int:
        return self._matrix.shape[0]

    def find_edge(self, edge: Edge) -> int:
        return self.edge_to_row.get(edge, -1)

    def shrink(self) -> np.ndarray:
        return self._matrix
