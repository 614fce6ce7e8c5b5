"""Isolate the int8 phase-C gather cost: DMA vs concat vs dot.

Usage: python tools/perf_gather_int8.py [Q]
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from merizo_search_tpu.ops import pallas_scan as ps

N = 1 << 24
D = 128
Q = int(sys.argv[1]) if len(sys.argv) > 1 else 256
K = 100
REP = 16
BLOCK = 128
NB = N // BLOCK


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
    print(f"{tag:46s} {t*1e3:7.3f} ms")
    return t


kd = jax.random.PRNGKey(0)
db8 = jax.jit(lambda k: jax.random.randint(k, (N, D), -127, 127, jnp.int8))(kd)
dbb = jax.jit(lambda k: jax.random.normal(k, (N, D), jnp.bfloat16))(kd)
q8 = jnp.asarray(np.random.default_rng(0).integers(-100, 100, (Q, D)).astype(np.int8))
qb = jax.random.normal(kd, (Q, D), jnp.bfloat16)

triv = jax.jit(lambda x: x + 1)
_ = np.asarray(triv(q8))
RTT = min(timed(lambda: np.asarray(triv(q8))) for _ in range(5))
print(f"# rtt {RTT*1e3:.1f} ms, Q={Q}, K={K}")

rng = np.random.default_rng(0)
KB = 102
G = 34
bidx0 = jnp.asarray(rng.integers(0, NB, (Q, KB)).astype(np.int32))


def gather_variant(db, body_kind):
    """Pallas gather of KB blocks/query in groups of G; kernel body varies."""
    d = D
    g = G
    dbr = db.reshape(NB, BLOCK, d) if db.ndim == 2 else db

    def blk_map(gg):
        return lambda i, j, bidx_ref: (
            jnp.maximum(bidx_ref[i, j * g + gg], 0), 0, 0)

    in_specs = [pl.BlockSpec((1, BLOCK, dbr.shape[2]), blk_map(gg),
                             memory_space=pltpu.VMEM) for gg in range(g)]

    def kernel(bidx_ref, *rest):
        out_ref = rest[-1]
        i, j = pl.program_id(0), pl.program_id(1)
        if body_kind == "dma_only":
            acc = jnp.zeros((1, BLOCK), jnp.float32)
            for gg in range(g):
                acc = acc + rest[gg][0, 0:1, :BLOCK].astype(jnp.float32)
            out_ref[:] = jnp.broadcast_to(acc.reshape(1, 1, 1, BLOCK),
                                          out_ref.shape)
        elif body_kind == "concat_only":
            vals = [rest[gg][:].reshape(BLOCK, dbr.shape[2]) for gg in range(g)]
            blocks = jnp.concatenate(vals, axis=0)
            out_ref[:] = jnp.broadcast_to(
                blocks[0:1, :BLOCK].astype(jnp.float32).reshape(1, 1, 1, BLOCK),
                out_ref.shape)
        else:  # full
            vals = [rest[gg][:].reshape(BLOCK, dbr.shape[2]) for gg in range(g)]
            blocks = jnp.concatenate(vals, axis=0)
            rows = jax.lax.broadcasted_iota(jnp.int32, (Q, 1), 0)
            if blocks.dtype == jnp.int8:
                q_row = jnp.sum(jnp.where(rows == i, q8[:], 0).astype(jnp.int32),
                                axis=0, keepdims=True).astype(jnp.int8)
                s = jax.lax.dot_general(
                    q_row, blocks, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
            else:
                q_row = jnp.sum(jnp.where(rows == i, qb[:], 0).astype(jnp.float32),
                                axis=0, keepdims=True).astype(blocks.dtype)
                s = jax.lax.dot_general(
                    q_row, blocks, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            out_ref[:] = s.reshape(1, 1, g, BLOCK)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Q, KB // g),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, g, BLOCK), lambda i, j, *_: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Q, KB // g, g, BLOCK), jnp.float32),
    )
    return f


for kind in ("dma_only", "concat_only", "full"):
    f8 = gather_variant(db8, kind)
    fb = gather_variant(dbb, kind)

    def run8(i, bidx, db):
        dbr = db.reshape(NB, BLOCK, D)
        return jnp.sum(f8((bidx + i) % NB, *([dbr] * G))[:, :, 0, :8])

    def runb(i, bidx, db):
        dbr = db.reshape(NB, BLOCK, D)
        return jnp.sum(fb((bidx + i) % NB, *([dbr] * G))[:, :, 0, :8])

    bench(run8, bidx0, db8, tag=f"int8 {kind}")
    bench(runb, bidx0, dbb, tag=f"bf16 {kind}")

# int32-viewed DMA of the same int8 bytes (16 KB contiguous per block)
db32 = jax.jit(lambda d: jax.lax.bitcast_convert_type(
    d.reshape(NB, BLOCK, D // 4, 4), jnp.int32))(db8)  # [NB, BLOCK, 32]
print(f"# db32 shape {db32.shape} {db32.dtype}")


def gather_int32view():
    g = G

    def blk_map(gg):
        return lambda i, j, bidx_ref: (
            jnp.maximum(bidx_ref[i, j * g + gg], 0), 0, 0)

    in_specs = [pl.BlockSpec((1, BLOCK, D // 4), blk_map(gg),
                             memory_space=pltpu.VMEM) for gg in range(g)]

    def kernel(bidx_ref, *rest):
        out_ref = rest[-1]
        acc = jnp.zeros((1, D // 4), jnp.float32)
        for gg in range(g):
            acc = acc + rest[gg][0, 0:1, :].astype(jnp.float32)
        out_ref[:] = jnp.broadcast_to(
            jnp.pad(acc, ((0, 0), (0, BLOCK - D // 4))).reshape(1, 1, 1, BLOCK),
            out_ref.shape)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Q, KB // g),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, g, BLOCK), lambda i, j, *_: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Q, KB // g, g, BLOCK), jnp.float32),
    )


fv = gather_int32view()


def runv(i, bidx, db):
    return jnp.sum(fv((bidx + i) % NB, *([db] * G))[:, :, 0, :8])


bench(runv, bidx0, db32, tag="int8-as-int32 dma_only")
