"""Experiment: phase-B BM slab gather formulations on the real TPU.

The gather reads BM [Q, NSB, NBT] (128 MB at Q=256, N=16M) selecting ~102
per-query superblock slabs; in-pipeline it costs ~0.7 ms (floor: one
streaming read ~0.16 ms). Variants probe where the inefficiency lives.
Uses the async-dispatch harness (_bench_util) — the earlier fori-loop
harness was defeated by XLA loop-invariant hoisting.

Usage: python tools/perf_slabgather.py [Q]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp

from _bench_util import bench, dispatch_overhead

N = 1 << 24
D = 128
Q = int(sys.argv[1]) if len(sys.argv) > 1 else 256
K = 102
TILE = 32768
BLOCK = 128
NSB = N // TILE          # 512
NBT = TILE // BLOCK      # 256

rng = np.random.default_rng(0)
bm = jnp.asarray(rng.normal(size=(Q, NSB, NBT)).astype(np.float32))
sbi0 = jnp.asarray(rng.integers(0, NSB, (Q, K)).astype(np.int32))
print(f"# dispatch overhead {dispatch_overhead()*1e6:.0f} us, "
      f"Q={Q}, K={K}, NSB={NSB}, NBT={NBT}")


def consume(x):
    return jnp.sum(jnp.maximum(x, -1.0))


def v_onehot(prec, kpad=None, dtype=jnp.float32):
    def fn(i, bm, sbi):
        s = (sbi + i) % NSB
        if kpad:
            s = jnp.pad(s, ((0, 0), (0, kpad - K)))
        oh = (s[:, :, None] == jnp.arange(NSB)[None, None, :]).astype(dtype)
        out = jnp.einsum("qks,qsb->qkb", oh,
                         bm.astype(dtype) if dtype != jnp.float32 else bm,
                         preferred_element_type=jnp.float32, precision=prec)
        return consume(out)
    return fn


def v_planes3(i, bm, sbi):
    """Exact: bitmask-split bm into 3 bf16 planes on the fly, 3 bf16 matmuls."""
    s = (sbi + i) % NSB
    oh = (s[:, :, None] == jnp.arange(NSB)[None, None, :]).astype(jnp.bfloat16)
    trunc = jnp.int32(-65536)
    bmi = jax.lax.bitcast_convert_type(bm, jnp.int32)
    hi = jax.lax.bitcast_convert_type(bmi & trunc, jnp.float32)
    r1 = bm - hi
    mid = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(r1, jnp.int32) & trunc, jnp.float32)
    lo = (r1 - mid).astype(jnp.bfloat16)
    out = sum(jnp.einsum("qks,qsb->qkb", oh, p.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
              for p in (hi, mid, lo))
    return consume(out)


def v_dotgen_swapped(i, bm, sbi):
    s = (sbi + i) % NSB
    oh = (s[:, :, None] == jnp.arange(NSB)[None, None, :]).astype(jnp.float32)
    out = jnp.einsum("qsb,qks->qbk", bm, oh,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return consume(out)


variants = [
    ("onehot f32 HIGHEST (current)", v_onehot(jax.lax.Precision.HIGHEST)),
    ("onehot f32 HIGH", v_onehot(jax.lax.Precision.HIGH)),
    ("onehot f32 DEFAULT", v_onehot(jax.lax.Precision.DEFAULT)),
    ("onehot f32 HIGHEST kpad128",
     v_onehot(jax.lax.Precision.HIGHEST, kpad=128)),
    ("onehot 3xbf16 planes (exact)", v_planes3),
    ("onehot swapped operands HIGHEST", v_dotgen_swapped),
]

for tag, fn in variants:
    try:
        bench(fn, bm, sbi0, rep=16, tag=tag)
    except Exception as e:
        print(f"{tag:46s} FAILED: {type(e).__name__}: {e}")
