"""HBM read-bandwidth ceiling probe (VERDICT r3 item 4: settle 624 vs 819).

Probe families over a 2 GB int8 buffer, each reading every byte exactly once
per iteration:
  stream[T]   Pallas grid pipeline: BlockSpec stages a [T, 128] tile
              HBM->VMEM per step; the kernel touches one 8x128 slice (plus
              the iteration index via SMEM, so the call can never be
              hoisted out of the timing loop) but runs no compute. Sweeping
              T separates per-step pipeline overhead from raw DMA rate.
  wide[T]     same, buffer viewed [N/8, 1024]: 8x wider rows, same bytes
              per tile, fewer lane-tile descriptors per DMA row.
  xla_reduce  the bench.py probe (fused multiply-reduce in XLA) for
              cross-calibration.

The max over probes is the *achievable* sustained read rate on this chip;
the scan kernels are judged against both this and the 819 GB/s spec.

Usage: python tools/perf_hbm.py
"""

import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from _bench_util import bench

GB = 1 << 30
NBYTES = 2 * GB


def _probe_kernel(i_ref, x_ref, o_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        o_ref[:] = jnp.full_like(o_ref, i_ref[0])
    o_ref[:] += x_ref[0:8, :].astype(jnp.float32)


def stream_probe(x, i, tile):
    n, d = x.shape
    return pl.pallas_call(
        _probe_kernel,
        grid=(n // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((tile, d), lambda s: (s, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, d), lambda s: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(jnp.asarray([i], jnp.float32), x)


def main():
    key = jax.random.PRNGKey(0)
    d = 128
    n = NBYTES // d  # int8 rows
    x = jax.jit(lambda k: jax.random.randint(
        k, (n, d), -127, 127, jnp.int8))(key)

    def run(view, tile, tag):
        def fn(i, v):
            return jnp.sum(stream_probe(v, i.astype(jnp.float32), tile))
        t = bench(fn, view, rep=5, inner=8)
        gbps = NBYTES / t / 1e9
        print(f"{tag:28s} {t*1e3:8.3f} ms   {gbps:7.1f} GB/s "
              f"({gbps/819*100:4.1f}% of spec)")
        return gbps

    best = 0.0
    for tile in (16384, 32768, 65536, 131072, 262144):
        best = max(best, run(x, tile, f"stream tile={tile}"))

    xw = x.reshape(n // 8, d * 8)
    for tile in (4096, 8192, 16384, 32768):
        # 2 staged buffers must fit the 110 MB scoped-vmem budget
        if 2 * tile * 1024 > 100 * 1024 * 1024:
            continue
        best = max(best, run(xw, tile, f"wide(1024) tile={tile}"))

    def xla_probe(i, x):
        w = (1 + (i % 2)).astype(jnp.int8)
        return jnp.sum((x * w).astype(jnp.int32))
    t = bench(xla_probe, x, rep=5, inner=8)
    gbps = NBYTES / t / 1e9
    print(f"{'xla_reduce':28s} {t*1e3:8.3f} ms   {gbps:7.1f} GB/s "
          f"({gbps/819*100:4.1f}% of spec)")
    best = max(best, gbps)
    print(f"# best achievable read: {best:.0f} GB/s "
          f"({best/819*100:.1f}% of 819 GB/s spec)")


if __name__ == "__main__":
    main()
