"""On-device smoke test: every SearchEngine execution mode on the real TPU.

Interpret-mode CPU tests can miss real-TPU lowering constraints (block shape
rules, layout copies), so this drives device/stream x bf16/int8/fp32 and IVF
against brute force on a 131k-row synthetic DB. Run on a TPU host:

    python tools/smoke_tpu.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp

from merizo_search_tpu.db import codecs
from merizo_search_tpu.search.engine import SearchEngine


def main():
    rng = np.random.default_rng(0)
    n, d = 1 << 17, 128
    embs = rng.normal(size=(n, d)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    entries = [(f"t{i}", np.zeros((3, 3), np.float32), "AAA") for i in range(n)]
    db = codecs.FlatDB.from_arrays(embs, entries, normalised=True)
    q = rng.normal(size=(8, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ref = np.argsort(-(q @ embs.T), axis=1)[:, :10]

    ok = True
    for label, min_recall, kw in [
        ("bf16 fused", 1.0, dict(dtype=jnp.bfloat16)),
        ("int8 engine", 0.85, dict(dtype=jnp.int8)),
        ("fp32 xla", 1.0, dict(dtype=jnp.float32)),
        ("stream bf16", 1.0, dict(dtype=jnp.bfloat16, max_device_gb=1e-4,
                                  stream_block=1 << 16)),
        ("stream int8", 0.85, dict(dtype=jnp.int8, max_device_gb=1e-4,
                                   stream_block=1 << 16)),
        # uniform random data has no cluster structure, so IVF recall here is
        # just a smoke bound (docs measure 0.97 on clustered data)
        ("ivf", 0.3, dict(dtype=jnp.bfloat16, index="ivf", ivf_nlist=64,
                          ivf_nprobe=16)),
    ]:
        try:
            eng = SearchEngine(db, **kw)
            t0 = time.time()
            _, idxs = eng.search(q, k=10)
            idxs = np.asarray(idxs)
            rec = float(np.mean([len(set(idxs[r]) & set(ref[r])) / 10
                                 for r in range(len(q))]))
            status = "ok" if rec >= min_recall else "LOW RECALL"
            ok &= rec >= min_recall
            print(f"{label:12s}: mode={eng.mode} recall@10={rec:.3f} "
                  f"({time.time() - t0:.1f}s) {status}")
        except Exception as e:
            ok = False
            print(f"{label:12s}: FAILED {type(e).__name__}: {str(e)[:300]}")
    print("smoke", "PASSED" if ok else "FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
