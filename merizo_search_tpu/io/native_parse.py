"""ctypes loader for the native CA parser (io/_native/pdbparse.cpp).

Built on demand with g++ into the writable cache dir (same pattern as
align/native.py); read_ca transparently falls back to the numpy parser when
the toolchain is unavailable. The C call releases the GIL, so createdb's
parser thread pool scales across cores.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native",
                    "pdbparse.cpp")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _lib_path() -> str:
    cache = os.environ.get(
        "MERIZO_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "merizo_tpu"))
    try:
        tag = int(os.path.getmtime(_SRC))
    except OSError:
        tag = 0
    return os.path.join(cache, f"libpdbparse-{tag}-mn.so")  # -mn: -march=native build flavor


def _build() -> str | None:
    try:
        lib = _lib_path()
        if os.path.exists(lib):
            return lib
        os.makedirs(os.path.dirname(lib), exist_ok=True)
        base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                "-o", lib, _SRC]
        # JIT-built on the running host: host-ISA tuning is safe; fall back
        # to a generic build if the toolchain rejects the flags
        try:
            subprocess.run(base[:2] + ["-march=native", "-funroll-loops"]
                           + base[2:], check=True, capture_output=True,
                           timeout=300)
        except subprocess.SubprocessError:
            subprocess.run(base, check=True, capture_output=True, timeout=300)
        return lib
    except (subprocess.SubprocessError, OSError) as e:
        err = getattr(e, "stderr", b"") or b""
        logger.warning("native pdb parser build failed: %s %s", e,
                       err.decode()[:500] if isinstance(err, bytes) else err)
        return None


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        lib.parse_ca.restype = ctypes.c_int
        lib.parse_ca.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char,
            ctypes.POINTER(ctypes.c_float), ctypes.c_char_p, ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def parse_ca_bytes(raw: bytes, chain: str):
    """CA records of `chain` from PDB file bytes -> (coords f32 [N,3], seq)
    or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    # every CA record occupies a >= 55-byte line (54 cols + newline)
    cap = max(4, len(raw) // 55 + 1)
    coords = np.empty((cap, 3), np.float32)
    seq = ctypes.create_string_buffer(cap)
    n = lib.parse_ca(
        raw, len(raw), chain.encode("ascii"),
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), seq, cap)
    if n > cap:  # cannot happen with the line-length bound; belt-and-braces
        return None
    return coords[:n].copy(), seq.raw[:n].decode("ascii")
