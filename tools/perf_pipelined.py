"""Exactness + throughput of the two-batch pipelined scan (fused_topk_step)
vs the sequential fused_topk, on the live chip.

MEASURED RESULT (v5e, 16M x 128): the fusion is bit-exact but SLOWER than
the sequential dispatch — Q=64 bf16 6.47 vs 6.32 ms, Q=256 bf16 10.5 vs
8.1 ms, Q=256 int8 6.2 vs 5.2 ms. Root cause isolated (see
_bm_gather_kernel's STATUS note): ~13 us of scalar-core DMA issue/wait
work per previous-batch query serialises inside the streaming kernel.
The sequential fused_topk stays the production path.

Usage: python tools/perf_pipelined.py [log2_rows] [bf16|int8|both] [Q,Q...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from merizo_search_tpu.ops.pallas_scan import fused_topk, fused_topk_step

N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 24)
WHAT = sys.argv[2] if len(sys.argv) > 2 else "both"
QNS = [int(x) for x in (sys.argv[3].split(",") if len(sys.argv) > 3
                        else ["64", "256"])]
D, K, REPEATS = 128, 100, 16


def rtt_floor():
    triv = jax.jit(lambda x: x + 1)
    x0 = jnp.zeros((8,), jnp.float32)
    np.asarray(triv(x0))
    return min(min((time.perf_counter(), np.asarray(triv(x0)),
                    time.perf_counter())[0::2][::-1]) or 0 for _ in range(1)
               ) if False else min(
        (lambda t0: (np.asarray(triv(x0)), time.perf_counter() - t0)[1])(
            time.perf_counter()) for _ in range(8))


def run(db, scales, qn, rtt):
    kq = jax.random.PRNGKey(1)
    qs = []
    for i in range(3):
        qf = jax.random.normal(jax.random.fold_in(kq, i), (qn, D),
                               jnp.bfloat16)
        if db.dtype == jnp.int8:
            qf = jnp.clip(qf.astype(jnp.float32) * 40, -127,
                          127).astype(jnp.int8)
        qs.append(qf)

    # correctness: pipeline 3 batches + drain, compare per batch
    carry = None
    outs = []
    for i in range(3):
        (v, idx), carry = fused_topk_step(qs[i], db, N, K, carry,
                                          scales=scales)
        outs.append((np.asarray(v), np.asarray(idx)))
    (v, idx), _ = fused_topk_step(qs[2], db, N, K, carry, scales=scales)
    outs.append((np.asarray(v), np.asarray(idx)))
    assert np.all(outs[0][0] == -np.inf) and np.all(outs[0][1] == -1), \
        "first step must return the all-miss primer"
    ok = True
    for i in range(3):
        vr, ir = fused_topk(qs[i], db, N, K, scales=scales)
        vr, ir = np.asarray(vr), np.asarray(ir)
        vp, ip = outs[i + 1]
        if not (np.array_equal(ir, ip) and np.allclose(vr, vp, rtol=0,
                                                       atol=0)):
            nm = int((ir != ip).sum())
            print(f"  Q={qn}: MISMATCH batch {i}: {nm} idx diffs, "
                  f"max |dv|={np.abs(np.where(np.isfinite(vr), vr, 0) - np.where(np.isfinite(vp), vp, 0)).max()}")
            ok = False
    if ok:
        print(f"  Q={qn}: pipelined == sequential on 3 batches (exact)")

    # throughput: steady-state loop on device
    @jax.jit
    def rep_pipe(q, db):
        def body(i, acc_carry):
            acc, carry = acc_carry
            qq = q * (1 + (i % 3).astype(q.dtype)) if db.dtype != jnp.int8 \
                else jnp.clip(q.astype(jnp.int32) + i % 3, -127,
                              127).astype(jnp.int8)
            (v, idx), carry = fused_topk_step(qq, db, N, K, carry,
                                              scales=scales)
            return (acc + jnp.sum(v, -1) + idx[:, 0].astype(jnp.float32),
                    carry)
        carry0 = jax.tree.map(jnp.zeros_like, _carry0(q, db))
        out, _ = jax.lax.fori_loop(0, REPEATS, body,
                                   (jnp.zeros((qn,), jnp.float32), carry0))
        return out

    def _carry0(q, db):
        _, c = fused_topk_step(q, db, N, K, None, scales=scales)
        return c

    @jax.jit
    def rep_seq(q, db):
        def body(i, acc):
            qq = q * (1 + (i % 3).astype(q.dtype)) if db.dtype != jnp.int8 \
                else jnp.clip(q.astype(jnp.int32) + i % 3, -127,
                              127).astype(jnp.int8)
            v, idx = fused_topk(qq, db, N, K, scales=scales)
            return acc + jnp.sum(v, -1) + idx[:, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, REPEATS, body,
                                 jnp.zeros((qn,), jnp.float32))

    for tag, fn in (("sequential", rep_seq), ("pipelined", rep_pipe)):
        np.asarray(fn(qs[0], db))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(qs[0], db))
            ts.append(time.perf_counter() - t0)
        t = (min(ts) - rtt) / REPEATS
        gb = N * D * db.dtype.itemsize / 1e9
        print(f"  Q={qn} {tag}: {t*1e3:.2f} ms/batch ({gb/t:.0f} GB/s, "
              f"{qn/t:.0f} q/s)")


def main():
    rtt = rtt_floor()
    print(f"# N={N}, D={D}, K={K}, rtt={rtt*1e3:.1f} ms")
    kd = jax.random.PRNGKey(0)
    if WHAT in ("bf16", "both"):
        db = jax.jit(lambda k: jax.random.normal(k, (N, D), jnp.bfloat16))(kd)
        db.block_until_ready()
        print("bf16:")
        for qn in QNS:
            run(db, None, qn, rtt)
        del db
    if WHAT in ("int8", "both"):
        db8 = jax.jit(lambda k: jnp.clip(
            jax.random.normal(k, (N, D), jnp.bfloat16).astype(jnp.float32)
            * 40, -127, 127).astype(jnp.int8))(kd)
        db8.block_until_ready()
        scales = jnp.full((N,), np.float32(1 / 40.0))
        print("int8:")
        for qn in QNS:
            run(db8, scales, qn, rtt)


if __name__ == "__main__":
    main()
