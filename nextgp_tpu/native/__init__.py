"""Native host runtime: ctypes bindings over libnextgp_native.so.

The shared library is compiled from `src/nextgp_native.cpp` on first use
(g++ -O3, std::thread parallelism) and cached next to the source. Every
caller in the package degrades gracefully to the pure-Python implementation
when no compiler is available (`lib()` returns None), so the native layer is
an accelerator, never a hard dependency.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sysconfig
import threading
from typing import Optional

_SRC = os.path.join(os.path.dirname(__file__), "src", "nextgp_native.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

ABI_VERSION = 2


def _so_path() -> str:
    """Cache path keyed by the source hash: a library is loaded only if it
    was compiled from exactly the committed source (git does not preserve
    mtimes, so mtime comparisons would trust stale or foreign binaries)."""
    with open(_SRC, "rb") as fh:
        h = hashlib.sha256(fh.read()).hexdigest()[:16]
    return os.path.join(os.path.dirname(__file__), f"libnextgp_native-{h}.so")


def _compile(so: str) -> bool:
    """Compile to a per-process temp path and os.replace() into place:
    concurrent processes (pytest workers, multi-host launch) share the
    cache path, and a reader must never dlopen a half-written ELF."""
    cxx = os.environ.get("CXX", "g++")
    tmp = f"{so}.{os.getpid()}.tmp"
    cmd = [
        cxx, "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        "-o", tmp, _SRC,
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=240)
        if r.returncode != 0 or not os.path.exists(tmp):
            return False
        os.replace(tmp, so)
        return True
    except Exception:
        try:
            os.remove(tmp)
        except OSError:
            pass
        return False


def _bind(dll: ctypes.CDLL) -> ctypes.CDLL:
    c = ctypes
    i8p, i64p, f64p = (
        c.POINTER(c.c_int8),
        c.POINTER(c.c_int64),
        c.POINTER(c.c_double),
    )
    dll.ng_version.restype = c.c_int32
    dll.ng_geno_dims.restype = c.c_int32
    dll.ng_geno_dims.argtypes = [c.c_char_p, i64p, i64p]
    dll.ng_geno_parse.restype = c.c_int32
    dll.ng_geno_parse.argtypes = [c.c_char_p, c.c_int64, c.c_int64, i8p, f64p, i64p]
    dll.ng_bed_read.restype = c.c_int32
    dll.ng_bed_read.argtypes = [c.c_char_p, c.c_int64, c.c_int64, i8p, f64p, i64p]
    dll.ng_inbreeding_ml.restype = c.c_int32
    dll.ng_inbreeding_ml.argtypes = [i64p, i64p, c.c_int64, f64p]
    dll.ng_ainverse_triplets.restype = c.c_int64
    dll.ng_ainverse_triplets.argtypes = [i64p, i64p, f64p, c.c_int64, i64p, i64p, f64p]
    dll.ng_write_tsv_block.restype = c.c_int32
    dll.ng_write_tsv_block.argtypes = [c.c_char_p, f64p, c.c_int64, c.c_int64]
    return dll


def lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, compiling it if needed; None on failure
    or when NEXTGP_NO_NATIVE is set."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried or os.environ.get("NEXTGP_NO_NATIVE"):
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _so_path()
        if not os.path.exists(so) and not _compile(so):
            return None
        try:
            dll = _bind(ctypes.CDLL(so))
            if dll.ng_version() != ABI_VERSION:
                # a stale/foreign binary at the hash-keyed path: rebuild to
                # a FRESH path — recompiling over the mapped inode risks
                # SIGBUS, and CDLL() on the same path would dedupe to the
                # stale handle without re-verifying the version
                so2 = f"{so[:-3]}-abi{ABI_VERSION}.so"
                dll = None
                if os.path.exists(so2):
                    # a prior process already rebuilt the fallback: reuse it
                    # instead of paying the per-process recompile
                    try:
                        cand = _bind(ctypes.CDLL(so2))
                        if cand.ng_version() == ABI_VERSION:
                            dll = cand
                    except OSError:
                        dll = None
                if dll is None:
                    if not _compile(so2):
                        return None
                    dll = _bind(ctypes.CDLL(so2))
                    if dll.ng_version() != ABI_VERSION:
                        return None
            _lib = dll
        except OSError:
            _lib = None
    return _lib


def available() -> bool:
    return lib() is not None
