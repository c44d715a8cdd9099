"""Native C++ core bindings (ctypes).

The reference's ingestion hot path is native C++/htslib (snarl_analyzer
.cpp:190-260, matrix.cpp); stoat-tpu's equivalent lives in
``stoat_core.cpp`` — a from-scratch streaming VCF parser + edge×haplotype
matrix builder with a plain C ABI, auto-compiled on first use (g++ -O3,
zlib for .gz).  Falls back to the pure-Python path when the toolchain is
unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger("stoat")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "stoat_core.cpp")
_LIB = os.path.join(_HERE, "libstoat_core.so")

_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-lz",
           "-o", _LIB]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        logger.warning("native core build failed to launch: %s", e)
        return False
    if res.returncode != 0:
        logger.warning("native core build failed:\n%s",
                       res.stderr.decode(errors="replace"))
        return False
    return True


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native core, or None."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError as e:
        logger.warning("native core load failed: %s", e)
        return None
    lib.stoat_vcf_open.restype = ctypes.c_void_p
    lib.stoat_vcf_open.argtypes = [ctypes.c_char_p]
    lib.stoat_vcf_n_samples.restype = ctypes.c_int64
    lib.stoat_vcf_n_samples.argtypes = [ctypes.c_void_p]
    lib.stoat_vcf_sample.restype = ctypes.c_char_p
    lib.stoat_vcf_sample.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.stoat_vcf_next_chunk.restype = ctypes.c_void_p
    lib.stoat_vcf_next_chunk.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.stoat_chunk_chrom.restype = ctypes.c_char_p
    lib.stoat_chunk_chrom.argtypes = [ctypes.c_void_p]
    lib.stoat_chunk_rows.restype = ctypes.c_uint64
    lib.stoat_chunk_rows.argtypes = [ctypes.c_void_p]
    lib.stoat_chunk_cols.restype = ctypes.c_uint64
    lib.stoat_chunk_cols.argtypes = [ctypes.c_void_p]
    lib.stoat_chunk_matrix.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.stoat_chunk_matrix.argtypes = [ctypes.c_void_p]
    lib.stoat_chunk_edges.restype = ctypes.POINTER(ctypes.c_uint64)
    lib.stoat_chunk_edges.argtypes = [ctypes.c_void_p]
    lib.stoat_chunk_free.argtypes = [ctypes.c_void_p]
    lib.stoat_vcf_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


class NativeVcfMatrixReader:
    """Streams per-chromosome edge×haplotype matrices via the C++ core."""

    def __init__(self, path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native core unavailable")
        self._lib = lib
        self._handle = lib.stoat_vcf_open(path.encode())
        if not self._handle:
            raise RuntimeError(f"native core could not open {path}")
        n = lib.stoat_vcf_n_samples(self._handle)
        self.samples = [lib.stoat_vcf_sample(self._handle, i).decode()
                        for i in range(n)]

    def chunks(self, initial_rows: int = 1024):
        """Yield (chrom, matrix bool [E, H], edge_to_row dict)."""
        lib = self._lib
        while True:
            cp = lib.stoat_vcf_next_chunk(self._handle, initial_rows)
            if not cp:
                return
            rows = lib.stoat_chunk_rows(cp)
            cols = lib.stoat_chunk_cols(cp)
            chrom = lib.stoat_chunk_chrom(cp).decode()
            mat = np.ctypeslib.as_array(
                lib.stoat_chunk_matrix(cp),
                shape=(int(rows), int(cols))).astype(bool)
            edges = np.ctypeslib.as_array(
                lib.stoat_chunk_edges(cp),
                shape=(int(rows), 4)).copy()
            lib.stoat_chunk_free(cp)
            edge_to_row = {
                ((int(e[0]), bool(e[1])), (int(e[2]), bool(e[3]))): i
                for i, e in enumerate(edges)
            }
            yield chrom, mat, edge_to_row

    def close(self) -> None:
        if self._handle:
            self._lib.stoat_vcf_close(self._handle)
            self._handle = None
