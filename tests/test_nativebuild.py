"""utils/nativebuild: the shared JIT builder/loader for the C++ libraries.

Covers the cache-robustness behaviours the loaders rely on: ISA-keyed
filenames, atomic publish, and delete-and-rebuild when a cached .so is
corrupt (e.g. truncated by a killed build under an older loader).
"""

import ctypes
import os

import pytest

from merizo_search_tpu.utils import nativebuild as nb

SRC = os.path.join(os.path.dirname(nb.__file__), "..", "align", "_native",
                   "tmalign.cpp")


@pytest.fixture()
def cache(tmp_path, monkeypatch):
    monkeypatch.setenv("MERIZO_TPU_CACHE", str(tmp_path))
    return tmp_path


def test_build_and_load(cache):
    lib = nb.load_native_lib(SRC, "tmalign")
    if lib is None:
        pytest.skip("no toolchain")
    assert isinstance(lib, ctypes.CDLL)
    names = os.listdir(cache)
    assert any(n.startswith("libtmalign-") and n.endswith(".so")
               for n in names)
    # filename carries the CPU fingerprint so a shared cache dir cannot
    # serve an ISA-incompatible binary to a different host
    assert any(nb._cpu_tag() in n for n in names)
    # no tmp leftovers from the atomic publish
    assert not [n for n in names if ".so" in n and not n.endswith(".so")]


def test_corrupt_cached_so_is_rebuilt(cache):
    path = nb.build_native_lib(SRC, "tmalign")
    if path is None:
        pytest.skip("no toolchain")
    with open(path, "wb") as fh:
        fh.write(b"not an elf file")
    lib = nb.load_native_lib(SRC, "tmalign")
    assert isinstance(lib, ctypes.CDLL)  # rebuilt, not a hard failure
    assert os.path.getsize(path) > 1000  # the corrupt copy was replaced


def test_cpu_tag_stable():
    assert nb._cpu_tag() == nb._cpu_tag()
    assert len(nb._cpu_tag()) == 10
