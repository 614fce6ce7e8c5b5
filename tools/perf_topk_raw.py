"""One-off: raw jax.lax.top_k cost vs width/k on the TPU, to map where
XLA's fast TopK path kicks in (hypothesis: k <= W/8 partial-reduce path),
vs the recursive _topk_finite cover.

Usage: python tools/perf_topk_raw.py [q=256]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp

from _bench_util import bench
from merizo_search_tpu.ops import pallas_scan as ps


def main():
    kw = dict(a.split("=") for a in sys.argv[1:])
    Q = int(kw.get("q", "256"))
    rng = np.random.default_rng(0)

    for w, k in [(512, 101), (512, 64), (512, 63), (816, 100), (816, 101),
                 (808, 101), (1024, 101), (3264, 101), (13056, 100),
                 (26112, 101)]:
        x = jnp.asarray(rng.normal(size=(Q, w)).astype(np.float32))

        def f(i, x, k=k):
            v, idx = jax.lax.top_k(x + i.astype(jnp.float32) * 0.0, k)
            return jnp.sum(v[:, :4]) + jnp.sum(idx[:, :4].astype(jnp.float32))
        bench(f, x, rep=5, inner=8, tag=f"lax.top_k W={w:6d} k={k}")

        def g(i, x, k=k):
            v, idx = ps._topk_finite(x + i.astype(jnp.float32) * 0.0, k)
            return jnp.sum(v[:, :4]) + jnp.sum(idx[:, :4].astype(jnp.float32))
        bench(g, x, rep=5, inner=8, tag=f"_topk_finite W={w:6d} k={k}")


if __name__ == "__main__":
    main()
