"""NumPy-facing wrappers over the native library.

Each function raises RuntimeError if the native library is unavailable;
call sites in `nextgp_tpu.data` check `native.available()` first and fall
back to their pure-Python implementations.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

from . import lib


def _l():
    dll = lib()
    if dll is None:
        raise RuntimeError("native library unavailable")
    return dll


def _p(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def geno_dims(path: str):
    """(n_rows, n_cols) of a delimited headerless genotype file."""
    dll = _l()
    n = ctypes.c_int64()
    p = ctypes.c_int64()
    rc = dll.ng_geno_dims(path.encode(), ctypes.byref(n), ctypes.byref(p))
    if rc != 0:
        raise OSError(f"cannot read {path!r} (rc={rc})")
    return n.value, p.value


def parse_genotypes(path: str):
    """Parallel parse: returns (int8 (n,p) dosages with -1 missing,
    col_sum f64 (p,), col_n i64 (p,))."""
    dll = _l()
    n, p = geno_dims(path)
    out = np.empty((n, p), np.int8)
    col_sum = np.zeros(p, np.float64)
    col_n = np.zeros(p, np.int64)
    rc = dll.ng_geno_parse(
        path.encode(), n, p, _p(out, ctypes.c_int8),
        _p(col_sum, ctypes.c_double), _p(col_n, ctypes.c_int64),
    )
    if rc == 2:
        raise ValueError(f"ragged rows in genotype file {path!r}")
    if rc == 3:
        raise ValueError(
            f"non-integral or invalid dosage token in {path!r}; genotypes "
            "must be integer dosages (0/1/2) — use from_float_array for "
            "real-valued data"
        )
    if rc != 0:
        raise OSError(f"cannot parse {path!r} (rc={rc})")
    return out, col_sum, col_n


def read_bed(path: str, n: int, p: int):
    """PLINK .bed (SNP-major) -> (int8 (n,p), col_sum, col_n)."""
    dll = _l()
    out = np.empty((n, p), np.int8)
    col_sum = np.zeros(p, np.float64)
    col_n = np.zeros(p, np.int64)
    rc = dll.ng_bed_read(
        path.encode(), n, p, _p(out, ctypes.c_int8),
        _p(col_sum, ctypes.c_double), _p(col_n, ctypes.c_int64),
    )
    if rc == 3:
        raise ValueError(f"{path!r}: bad .bed magic (need SNP-major v1.0)")
    if rc != 0:
        raise OSError(f"cannot read {path!r} (rc={rc})")
    return out, col_sum, col_n


def inbreeding(sire: np.ndarray, dam: np.ndarray) -> np.ndarray:
    dll = _l()
    s = np.ascontiguousarray(sire, np.int64)
    d = np.ascontiguousarray(dam, np.int64)
    f = np.zeros(len(s), np.float64)
    dll.ng_inbreeding_ml(
        _p(s, ctypes.c_int64), _p(d, ctypes.c_int64), len(s), _p(f, ctypes.c_double)
    )
    return f


def ainverse_triplets(sire, dam, f):
    """COO triplets (rows, cols, vals) of A-inverse; duplicates unsummed."""
    dll = _l()
    s = np.ascontiguousarray(sire, np.int64)
    d = np.ascontiguousarray(dam, np.int64)
    fc = np.ascontiguousarray(f, np.float64)
    n = len(s)
    cap = 9 * n
    ri = np.empty(cap, np.int64)
    ci = np.empty(cap, np.int64)
    v = np.empty(cap, np.float64)
    k = dll.ng_ainverse_triplets(
        _p(s, ctypes.c_int64), _p(d, ctypes.c_int64), _p(fc, ctypes.c_double),
        n, _p(ri, ctypes.c_int64), _p(ci, ctypes.c_int64), _p(v, ctypes.c_double),
    )
    return ri[:k], ci[:k], v[:k]


def write_tsv_block(path: str, block: np.ndarray) -> None:
    dll = _l()
    b = np.ascontiguousarray(block, np.float64)
    if b.ndim == 1:
        b = b[None, :]
    rc = dll.ng_write_tsv_block(path.encode(), _p(b, ctypes.c_double), b.shape[0], b.shape[1])
    if rc != 0:
        reason = "partial write (disk full?)" if rc == 2 else "cannot open"
        raise OSError(f"append to {path!r} failed: {reason}")
