"""TM-align rescoring throughput: native C++ backend, full and fast mode.

Synthetic 3.8-A random-walk chains (protein-like step geometry) so the
numbers are reproducible anywhere; real-structure throughput tracks these
within ~20% at equal lengths. The reference invokes the TM-align binary as
a subprocess per pair with PDB files round-tripped through disk
(Foldclass/utils.py:75-109); this library is called in-process on packed
coordinate arrays.

Usage: python tools/perf_align.py [npairs=64] [len_q=150] [len_t=140]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from merizo_search_tpu.align import native

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
LQ = int(sys.argv[2]) if len(sys.argv) > 2 else 150
LT = int(sys.argv[3]) if len(sys.argv) > 3 else 140

rng = np.random.default_rng(0)


def synth(n):
    steps = rng.normal(size=(n, 3))
    steps /= np.linalg.norm(steps, axis=1, keepdims=True)
    return {"coords": np.cumsum(steps * 3.8, axis=0).astype(np.float32),
            "seq": "A" * n}


pairs = [(synth(LQ), synth(LT)) for _ in range(N)]
native.tmalign_pairs_native(pairs[:2])  # warm the JIT build

for fast in (False, True):
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        r = native.tmalign_pairs_native(pairs, fast=fast, nthreads=0)
        best = max(best, N / (time.perf_counter() - t0))
    tag = "fast" if fast else "full"
    print(f"{tag}: {best:7.1f} pairs/s  ({LQ}x{LT} res, n={N}, "
          f"qtm0={r[0]['qtm']:.4f})")
