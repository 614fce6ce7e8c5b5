"""Model-forward benchmarks on the live TPU: Merizo segmenter and Foldclass
embedder, against the reference's published demo runtimes (BASELINE.md:
0.72 s / 0.40 s / 0.25 s per structure at 775/432/272 residues for segment;
createdb embeds one structure per forward pass).

Weights are random-init (reference checkpoints are stripped) — identical
FLOPs, so timings are representative.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from merizo_search_tpu.models.merizo import network as mznet
from merizo_search_tpu.models import foldclass as fc
from merizo_search_tpu.utils.bucketing import bucket_for


def timed(f, n=5):
    f()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def rtt_floor():
    triv = jax.jit(lambda x: x + 1)
    x0 = jnp.zeros((8,), jnp.float32)
    np.asarray(triv(x0))
    return min(timed(lambda: np.asarray(triv(x0)), 5) for _ in range(2))


def bench_merizo(rtt):
    params = mznet.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    fwd = jax.jit(mznet.forward_features)
    for nres in (272, 432, 775):
        n = bucket_for(nres)
        s = jnp.asarray(rng.normal(size=(1, n, 20)).astype(np.float32))
        coords = np.cumsum(rng.normal(size=(n, 3)) * 2.0, axis=0)
        d = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
        z = jnp.asarray(d.reshape(1, n, n, 1).astype(np.float32))
        r = jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32), (1, n, 3, 3)).copy())
        t = jnp.asarray(coords.reshape(1, n, 3).astype(np.float32))
        ri = jnp.asarray(np.arange(n, dtype=np.float32).reshape(1, n))
        mask = np.ones((1, n), np.float32)
        mask[:, nres:] = 0.0
        mask = jnp.asarray(mask)

        def run():
            out = fwd(params, s, z, r, t, ri, mask)
            jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)

        tm = timed(run) - rtt
        print(f"merizo forward {nres:4d} res (bucket {n:4d}): {tm*1e3:7.1f} ms "
              f"(reference demo: {dict([(272,0.252),(432,0.396),(775,0.717)])[nres]*1e3:.0f} ms)")


def bench_foldclass(rtt):
    params = fc.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    for bsz, n in ((64, 128), (32, 256), (8, 512)):
        coords = jnp.asarray(rng.normal(size=(bsz, n, 3)).astype(np.float32))
        mask = jnp.ones((bsz, n), jnp.float32)

        def run():
            fc.embed(params, coords, mask).block_until_ready()

        tm = timed(run) - rtt
        print(f"foldclass embed batch {bsz:3d} x {n:4d} res: {tm*1e3:7.1f} ms "
              f"({bsz/tm:6.0f} structs/s)")


def main():
    rtt = rtt_floor()
    print(f"rtt floor {rtt*1e3:.1f} ms")
    bench_foldclass(rtt)
    bench_merizo(rtt)


if __name__ == "__main__":
    main()
