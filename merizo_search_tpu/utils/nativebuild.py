"""Shared JIT builder/loader for the in-tree C++ libraries.

Used by io/native_parse.py (CA parser) and align/native.py (TM-align).
Handles the pitfalls a naive "g++ once into the cache dir" loader has:

- **ISA-safe cache key.** Libraries are built with ``-march=native`` (the
  build always runs on the host that executes it, so host-ISA tuning is
  safe *per host*) — but the cache dir may be shared (NFS $HOME, a reused
  container image). The filename therefore carries a fingerprint of the
  host CPU (model name + flag set) and the build flavor, so a host with a
  different ISA rebuilds instead of dlopening AVX-512 code it cannot run.
- **Atomic publish.** g++ writes to a tmp name in the same directory and
  the result is ``os.rename``d into place, so a killed build (timeout,
  OOM, disk-full) can never leave a truncated .so that every later
  process trusts because ``os.path.exists`` is true.
- **Corrupt-cache recovery.** If ``ctypes.CDLL`` rejects a cached file
  anyway (e.g. written by an older loader), the file is deleted and
  rebuilt once before giving up.
- **Generic fallback is cached under its own flavor tag**, so a host whose
  toolchain rejects ``-march=native`` does not publish a generic build
  under the native-flavored name.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile

logger = logging.getLogger(__name__)

_GENERIC = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17"]
_NATIVE_FLAGS = ["-march=native", "-funroll-loops"]


def cache_dir() -> str:
    return os.environ.get(
        "MERIZO_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "merizo_tpu"))


def _cpu_tag() -> str:
    """Short fingerprint of the host CPU's ISA surface."""
    try:
        with open("/proc/cpuinfo") as fh:
            lines = fh.read(65536).splitlines()
        keep = [ln for ln in lines
                if ln.startswith(("model name", "flags", "Features"))]
        blob = keep[0] + (keep[1] if len(keep) > 1 else "")
    except OSError:
        import platform
        blob = platform.machine() + platform.processor()
    return hashlib.sha256(blob.encode()).hexdigest()[:10]


def _build_once(src: str, out: str, extra: list[str]) -> None:
    """Compile src -> out atomically (tmp file + rename)."""
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(out))
    os.close(fd)
    try:
        subprocess.run(_GENERIC + extra + ["-o", tmp, src, "-lpthread"],
                       check=True, capture_output=True, timeout=300)
        os.rename(tmp, out)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def build_native_lib(src: str, name: str) -> str | None:
    """Return the path of the compiled shared library for `src`, building
    it if the cache has no valid copy. None when no toolchain works."""
    try:
        tag = int(os.path.getmtime(src))
    except OSError:
        tag = 0
    cdir = cache_dir()
    for flavor, extra in (("mn", _NATIVE_FLAGS), ("gen", [])):
        lib = os.path.join(cdir, f"lib{name}-{tag}-{_cpu_tag()}-{flavor}.so")
        if os.path.exists(lib):
            return lib
        try:
            os.makedirs(cdir, exist_ok=True)
            _build_once(src, lib, extra)
            return lib
        except (subprocess.SubprocessError, OSError) as e:
            err = getattr(e, "stderr", b"") or b""
            logger.warning(
                "native %s build (%s) failed: %s %s", name, flavor, e,
                err.decode()[:500] if isinstance(err, bytes) else err)
    return None


def load_native_lib(src: str, name: str) -> ctypes.CDLL | None:
    """build_native_lib + CDLL, deleting and rebuilding once if a cached
    file fails to load (corrupt copies from older loaders)."""
    for attempt in range(2):
        path = build_native_lib(src, name)
        if path is None:
            return None
        try:
            return ctypes.CDLL(path)
        except OSError as e:
            logger.warning("cached %s rejected by dlopen (%s); rebuilding",
                           path, e)
            try:
                os.unlink(path)
            except OSError:
                return None
    return None
