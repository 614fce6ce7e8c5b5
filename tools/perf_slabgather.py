"""Experiment: phase-B BM slab gather formulations on the real TPU.

The gather reads BM [Q, NSB, NBT] (128 MB at Q=256, N=16M) selecting ~102
per-query superblock slabs. Floor = one streaming read (~0.16 ms); measured
~0.7 ms via the batched one-hot einsum. Variants probe where the
inefficiency lives.

Usage: python tools/perf_slabgather.py [Q]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N = 1 << 24
D = 128
Q = int(sys.argv[1]) if len(sys.argv) > 1 else 256
K = 102
TILE = 32768
BLOCK = 128
NSB = N // TILE          # 512
NBT = TILE // BLOCK      # 256
REP = 32


def timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def bench(fn, *args, rep=REP, tag=""):
    @jax.jit
    def repeated(*a):
        def body(i, acc):
            return acc + fn(i, *a)
        return jax.lax.fori_loop(0, rep, body, jnp.float32(0))

    _ = np.asarray(repeated(*args))
    total = min(timed(lambda: np.asarray(repeated(*args))) for _ in range(3))
    t = (total - RTT) / rep
    print(f"{tag:44s} {t*1e3:7.3f} ms")
    return t


rng = np.random.default_rng(0)
bm = jnp.asarray(rng.normal(size=(Q, NSB, NBT)).astype(np.float32))
sbi0 = jnp.asarray(rng.integers(0, NSB, (Q, K)).astype(np.int32))

triv = jax.jit(lambda x: x + 1)
_ = np.asarray(triv(sbi0))
RTT = min(timed(lambda: np.asarray(triv(sbi0))) for _ in range(5))
print(f"# rtt {RTT*1e3:.1f} ms, Q={Q}, K={K}, NSB={NSB}, NBT={NBT}, rep={REP}")


def consume(x):
    return jnp.sum(jnp.maximum(x, -1.0))


def v_onehot(prec, kpad=None, dtype=jnp.float32):
    def fn(i, bm, sbi):
        s = (sbi + i) % NSB
        if kpad:
            s = jnp.pad(s, ((0, 0), (0, kpad - K)))
        oh = (s[:, :, None] == jnp.arange(NSB)[None, None, :]).astype(dtype)
        out = jnp.einsum("qks,qsb->qkb", oh, bm.astype(dtype) if dtype != jnp.float32 else bm,
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
    """Contract as bm^T @ onehot^T to probe operand-order lowering."""
    s = (sbi + i) % NSB
    oh = (s[:, :, None] == jnp.arange(NSB)[None, None, :]).astype(jnp.float32)
    out = jnp.einsum("qsb,qks->qbk", bm, oh,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return consume(out)


variants = [
    ("onehot f32 HIGHEST (current)",
     v_onehot(jax.lax.Precision.HIGHEST)),
    ("onehot f32 HIGH",
     v_onehot(jax.lax.Precision.HIGH)),
    ("onehot f32 DEFAULT",
     v_onehot(jax.lax.Precision.DEFAULT)),
    ("onehot f32 HIGHEST kpad128",
     v_onehot(jax.lax.Precision.HIGHEST, kpad=128)),
    ("onehot 3xbf16 planes (exact)",
     v_planes3),
    ("onehot swapped operands HIGHEST",
     v_dotgen_swapped),
]

for tag, fn in variants:
    try:
        bench(fn, bm, sbi0, tag=tag)
    except Exception as e:  # keep going past unsupported variants
        print(f"{tag:44s} FAILED: {type(e).__name__}: {e}")
