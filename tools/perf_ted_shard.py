"""Measure the REAL per-chip TED-365M shard scan on the live chip.

BASELINE.md defines the perf target at TED scale: 365M x 128-d over a
v5e-8 mesh = 45,625,000 rows per chip. Prior rounds benchmarked a 16M-row
DB and *projected* the TED number; this tool scans an actual 45.6M-row
resident shard (bf16 11.7 GB / int8 5.8 GB in HBM) with the production
fused_topk (k=100), plus the HBM read-ceiling probe at the same footprint,
so BENCH reports a measured shard qps, not an extrapolation.

The per-batch phase B/C selection cost is a constant (~0.5-1.8 ms), so the
speed-of-light fraction IMPROVES with shard size — the 16M-row figures in
earlier rounds under-reported the deployment regime.

Also times the 8-way top-k merge compute (merge_partials on a [8, Q, k]
gather) single-chip, so the mesh answer models ICI with measured compute +
spec-bandwidth transfer instead of asserting "sub-ms".

Usage: python tools/perf_ted_shard.py [rows] [bf16|int8|both|merge]
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp

from merizo_search_tpu.ops.pallas_scan import fused_topk, DEFAULT_TILE

TED_ROWS = 365_000_000
NDEV = 8
ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else TED_ROWS // NDEV
WHAT = sys.argv[2] if len(sys.argv) > 2 else "both"
D, K = 128, 100
REPEATS = 8


def pad_rows(n):
    return -(-n // DEFAULT_TILE) * DEFAULT_TILE


def rtt_floor():
    triv = jax.jit(lambda x: x + 1)
    x0 = jnp.zeros((8,), jnp.float32)
    np.asarray(triv(x0))
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        np.asarray(triv(x0))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timed(f, rtt, n=3):
    f()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return (min(ts) - rtt) / REPEATS


def read_probe(db, rtt):
    """Fused multiply-reduce over the whole DB: the achievable read ceiling
    at this exact footprint (same probe as bench.py's hbm_read_ceiling).
    Operates on the 2-D array in place — a flat reshape materialises a
    second copy under the TPU's tiled layout, which OOMs at 11.7 GB."""
    @jax.jit
    def probe(db, s):
        def body(i, acc):
            return acc + jnp.sum(db * (s + i.astype(db.dtype)),
                                 dtype=jnp.float32)
        return jax.lax.fori_loop(0, REPEATS, body, jnp.float32(0))
    s = jnp.ones((), db.dtype)
    t = timed(lambda: np.asarray(probe(db, s)), rtt)
    return t


def bench_scan(db, n_valid, qn, rtt, scales=None):
    kq = jax.random.PRNGKey(1)
    q = jax.random.normal(kq, (qn, D), jnp.bfloat16)
    if db.dtype == jnp.int8:
        q = jnp.clip(q.astype(jnp.float32) * 40, -127, 127).astype(jnp.int8)

    @jax.jit
    def rep(q, db):
        def body(i, acc):
            if db.dtype == jnp.int8:
                qq = jnp.clip(q.astype(jnp.int32) + i % 3, -127, 127
                              ).astype(jnp.int8)
            else:
                qq = q * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
            v, idx = fused_topk(qq, db, n_valid, K, scales=scales)
            return acc + jnp.sum(v, axis=-1) + idx[:, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros((qn,),
                                                             jnp.float32))

    t = timed(lambda: np.asarray(rep(q, db)), rtt)
    return t


def merge_model(qn, rtt):
    """Mesh merge cost model: measured merge_partials compute on a
    [NDEV, Q, K] candidate set + ICI transfer at spec bandwidth."""
    from merizo_search_tpu.ops import topk as topk_ops
    kv = jax.random.PRNGKey(2)
    av = jax.random.normal(kv, (NDEV, qn, K), jnp.float32)
    ai = jax.random.randint(kv, (NDEV, qn, K), 0, 1 << 24, jnp.int32)

    @jax.jit
    def rep(av, ai):
        def body(i, acc):
            v, idx = topk_ops.merge_partials(av + i.astype(jnp.float32), ai, K)
            return acc + jnp.sum(v[:, 0]) + jnp.sum(idx[:, 0])
        return jax.lax.fori_loop(0, REPEATS, body, jnp.float32(0))

    t_compute = timed(lambda: np.asarray(rep(av, ai)), rtt)
    # all_gather of [Q, K] f32 + i32 partials over the ring: each chip sends
    # its 2*Q*K*4 bytes around; v5e ICI ~ 186 GB/s per direction per link
    # (1600 Gbps aggregate / chip), take a conservative 100 GB/s effective
    bytes_per_chip = 2 * qn * K * 4 * (NDEV - 1)
    t_ici = bytes_per_chip / 100e9
    return t_compute, t_ici


def main():
    npad = pad_rows(ROWS)
    rtt = rtt_floor()
    print(f"# rows={ROWS} (padded {npad}), D={D}, K={K}, rtt={rtt*1e3:.1f} ms")

    if WHAT in ("merge",):
        for qn in (64, 256):
            tc, ti = merge_model(qn, rtt)
            print(f"merge Q={qn}: compute {tc*1e3:.3f} ms + ICI model "
                  f"{ti*1e3:.3f} ms")
        return

    kd = jax.random.PRNGKey(0)
    if WHAT in ("bf16", "both"):
        db = jax.jit(lambda k: jax.random.normal(k, (npad, D), jnp.bfloat16),
                     )(kd)
        db.block_until_ready()
        gb = npad * D * 2 / 1e9
        t_read = read_probe(db, rtt)
        print(f"bf16 read probe: {t_read*1e3:.2f} ms ({gb/t_read:.0f} GB/s)")
        for qn in (64, 256):
            t = bench_scan(db, ROWS, qn, rtt)
            flops = 2.0 * npad * D * qn
            t_sol = max(gb / 819.0 * 1e-3 if False else npad * D * 2 / 819e9,
                        flops / 197e12)
            print(f"bf16 Q={qn}: {t*1e3:.2f} ms ({gb/t:.0f} GB/s, "
                  f"{qn/t:.0f} q/s, sol={t_sol/t:.3f}, "
                  f"vs_read={t_read/t:.3f})")
        del db

    if WHAT in ("int8", "both"):
        db8 = jax.jit(lambda k: jnp.clip(
            jax.random.normal(k, (npad, D), jnp.bfloat16).astype(jnp.float32)
            * 40, -127, 127).astype(jnp.int8))(kd)
        db8.block_until_ready()
        scales = jnp.full((npad,), np.float32(1 / 40.0))
        gb = npad * D / 1e9
        t_read = read_probe(db8, rtt)
        print(f"int8 read probe: {t_read*1e3:.2f} ms ({gb/t_read:.0f} GB/s)")
        for qn in (64, 256):
            t = bench_scan(db8, ROWS, qn, rtt, scales=scales)
            ops = 2.0 * npad * D * qn
            t_sol = max(npad * D / 819e9, ops / 394e12)
            print(f"int8 Q={qn}: {t*1e3:.2f} ms ({gb/t:.0f} GB/s, "
                  f"{qn/t:.0f} q/s, sol={t_sol/t:.3f}, "
                  f"vs_read={t_read/t:.3f})")

        for qn in (64, 256):
            tc, ti = merge_model(qn, rtt)
            print(f"merge Q={qn}: compute {tc*1e3:.3f} ms + ICI model "
                  f"{ti*1e3:.3f} ms")


if __name__ == "__main__":
    main()
