"""ctypes bindings for the native runtime (builds on first use).

The compute path is JAX/XLA; this native layer covers the IO-bound
runtime around it (sequence ingest, DB archive parsing) where the
reference also uses C++.  Falls back to pure Python transparently if
no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "kreeq_native.cpp")
_LIB = os.path.join(_HERE, "libkreeq_native.so")
_HASH = _LIB + ".srchash"  # content hash of _SRC the .so was built from

_lib = None
_tried = False


def _src_hash() -> str:
    with open(_SRC, "rb") as fh:
        return hashlib.sha256(fh.read()).hexdigest()


def _build() -> bool:
    cmd = ["g++", "-O3", "-std=gnu++17", "-shared", "-fPIC", _SRC,
           "-o", _LIB, "-lz"]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        if res.returncode != 0:
            return False
        with open(_HASH, "w") as fh:
            fh.write(_src_hash())
        return True
    except Exception:
        return False


def _stale() -> bool:
    """Rebuild keyed on source content hash (mtimes don't survive git)."""
    if not os.path.exists(_LIB):
        return True
    try:
        with open(_HASH) as fh:
            return fh.read().strip() != _src_hash()
    except OSError:
        return True


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if _stale():
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.kn_parse_fastx.restype = ctypes.c_void_p
    lib.kn_parse_fastx.argtypes = [ctypes.c_char_p]
    lib.kn_num_seqs.restype = ctypes.c_uint64
    lib.kn_num_seqs.argtypes = [ctypes.c_void_p]
    lib.kn_num_codes.restype = ctypes.c_uint64
    lib.kn_num_codes.argtypes = [ctypes.c_void_p]
    lib.kn_codes.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.kn_codes.argtypes = [ctypes.c_void_p]
    lib.kn_offsets.restype = ctypes.POINTER(ctypes.c_uint64)
    lib.kn_offsets.argtypes = [ctypes.c_void_p]
    lib.kn_free.argtypes = [ctypes.c_void_p]

    lib.kn_parse_phmap.restype = ctypes.c_void_p
    lib.kn_parse_phmap.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                                   ctypes.c_uint64, ctypes.c_int]
    lib.kn_phmap_count.restype = ctypes.c_uint64
    lib.kn_phmap_count.argtypes = [ctypes.c_void_p]
    lib.kn_phmap_keys.restype = ctypes.POINTER(ctypes.c_uint64)
    lib.kn_phmap_keys.argtypes = [ctypes.c_void_p]
    lib.kn_phmap_vals.restype = ctypes.POINTER(ctypes.c_uint32)
    lib.kn_phmap_vals.argtypes = [ctypes.c_void_p]
    lib.kn_phmap_free.argtypes = [ctypes.c_void_p]
    lib.kn_phmap_place.restype = ctypes.c_int
    lib.kn_phmap_place.argtypes = [ctypes.POINTER(ctypes.c_uint64),
                                   ctypes.c_uint64, ctypes.c_uint64,
                                   ctypes.POINTER(ctypes.c_uint32)]
    _lib = lib
    return _lib


def parse_fastx(path: str) -> Optional[List[np.ndarray]]:
    """Parse FASTA/FASTQ(.gz) into per-sequence uint8 code arrays."""
    lib = get_lib()
    if lib is None:
        return None
    h = lib.kn_parse_fastx(path.encode())
    if not h:
        return None
    try:
        n_seqs = lib.kn_num_seqs(h)
        n_codes = lib.kn_num_codes(h)
        if n_seqs == 0:
            return []
        codes = np.ctypeslib.as_array(lib.kn_codes(h),
                                      shape=(n_codes,)).copy()
        offsets = np.ctypeslib.as_array(lib.kn_offsets(h),
                                        shape=(n_seqs,)).copy()
        bounds = np.append(offsets, np.uint64(n_codes)).astype(np.int64)
        return [codes[bounds[i]:bounds[i + 1]] for i in range(n_seqs)]
    finally:
        lib.kn_free(h)


def phmap_place(hashes: np.ndarray, cap: int) -> Optional[np.ndarray]:
    """SwissTable slot positions for one submap (mixed hashes, cap=2^n-1)."""
    lib = get_lib()
    if lib is None:
        return None
    hs = np.ascontiguousarray(hashes, np.uint64)
    pos = np.empty(len(hs), np.uint32)
    rc = lib.kn_phmap_place(
        hs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(hs), cap,
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    if rc != 0:
        raise ValueError("phmap placement over-filled a submap")
    return pos


def parse_phmap(data: bytes, wide: bool) -> Optional[Tuple[np.ndarray,
                                                           np.ndarray]]:
    """Parse a phmap dump into (keys u64[n], vals u32[n,9])."""
    lib = get_lib()
    if lib is None:
        return None
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    h = lib.kn_parse_phmap(buf, len(data), 1 if wide else 0)
    if not h:
        raise ValueError("corrupt phmap archive")
    try:
        n = lib.kn_phmap_count(h)
        if n == 0:
            return (np.zeros(0, np.uint64), np.zeros((0, 9), np.uint32))
        keys = np.ctypeslib.as_array(lib.kn_phmap_keys(h),
                                     shape=(n,)).copy()
        vals = np.ctypeslib.as_array(lib.kn_phmap_vals(h),
                                     shape=(n, 9)).copy()
        return keys, vals
    finally:
        lib.kn_phmap_free(h)
