"""Headline benchmark: exact flat top-k search throughput on TPU.

Measures queries/sec for batched exact cosine top-100 over a synthetic
16,777,216 x 128 embedding database (~32x CATH-4.3 scale; the same scan that
runs per-block at TED-365M scale) on the single available TPU chip, and
compares against the reference implementation's own scan — the torch
F.cosine_similarity + topk dense pass (reference dbsearch.py:75-81) executed
on this host's CPU.

Measurement note: this TPU is reached through a tunnel whose per-call
synchronisation costs ~30 ms, so the scan is repeated M times *inside one
jitted call* (queries perturbed per iteration to defeat CSE) and the
tunnel round-trip floor is subtracted once.

Prints ONE JSON line:
  {"metric": ..., "value": qps, "unit": "queries/s", "vs_baseline": ratio}
"""

import json
import sys
import time
from functools import partial

import numpy as np


DB_N = 1 << 24          # 16,777,216 vectors (4 GB bf16 resident in HBM)
DIM = 128
N_QUERIES = 256
K = 100
REPEATS = 24
DTYPE = "bfloat16"      # halves HBM traffic; scores accumulate in fp32


def tpu_qps():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from merizo_search_tpu.ops.pallas_scan import fused_topk

    kq, kd = jax.random.split(jax.random.PRNGKey(0))
    # generate the DB directly in bf16 (4 GB at 16M rows) — normalisation
    # would need an 8 GB fp32 intermediate and does not change the scan work
    # (exact IP top-k on raw vectors is the same kernel; the recall check
    # below brute-forces the same raw vectors).
    dtype = jnp.bfloat16 if DTYPE == "bfloat16" else jnp.float32
    db = jax.jit(lambda k: jax.random.normal(k, (DB_N, DIM), dtype))(kd)
    q0 = jax.random.normal(kq, (N_QUERIES, DIM), jnp.float32)
    q0 = (q0 / jnp.linalg.norm(q0, axis=1, keepdims=True)).astype(db.dtype)

    @jax.jit
    def repeated(q0, db):
        def body(i, acc):
            q = q0 * (1.0 + i.astype(db.dtype) * db.dtype.type(1e-3))
            v, idx = fused_topk(q, db, DB_N, K)
            return acc + jnp.sum(v, axis=-1) + idx[:, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros((N_QUERIES,), jnp.float32))

    # tunnel round-trip floor
    triv = jax.jit(lambda x: x + 1)
    _ = np.asarray(triv(q0))
    rtt = min(_timed(lambda: np.asarray(triv(q0))) for _ in range(5))

    _ = np.asarray(repeated(q0, db))  # compile + warm
    total = min(_timed(lambda: np.asarray(repeated(q0, db))) for _ in range(3))
    t = (total - rtt) / REPEATS

    # recall sanity: exact selection must match fp32 numpy brute force
    sl = 1 << 17
    dbn = np.asarray(db[:sl], np.float32)
    qn = np.asarray(q0, np.float32)
    s = qn @ dbn.T
    ref_top = np.argsort(-s, axis=1)[:, :K]
    ref_kth = np.take_along_axis(s, ref_top, 1)[:, -1]
    vv, ii = fused_topk(jnp.asarray(qn), jnp.asarray(dbn), sl, K, tile=8192)
    ii = np.asarray(ii)
    # margin-aware exact-recall: all clearly-above-threshold refs recovered
    rec = np.mean([
        len(set(ii[r]) & set(ref_top[r][s[r][ref_top[r]] > ref_kth[r] + 1e-5])) /
        max(1, len(ref_top[r][s[r][ref_top[r]] > ref_kth[r] + 1e-5]))
        for r in range(N_QUERIES)])

    qps = N_QUERIES / t
    gbps = DB_N * DIM * (2 if DTYPE == "bfloat16" else 4) / t / 1e9
    print(f"# tpu exact scan: {t*1e3:.2f} ms/batch of {N_QUERIES} "
          f"({gbps:.0f} GB/s, recall@{K}={rec:.4f}, rtt={rtt*1e3:.1f} ms)",
          file=sys.stderr)

    # secondary: the int8 quantised scan (same kernel family, half the HBM
    # traffic; exact top-k of the quantised scores)
    try:
        from merizo_search_tpu.ops.pallas_scan import fused_topk as ft
        # scale 40 keeps ~99.8% of N(0,1) entries in range; clip the rest so
        # the int8 data is well-defined (values only matter for timing)
        db8 = jax.jit(lambda d: jnp.clip(d * jnp.bfloat16(40), -127, 127)
                      .astype(jnp.int8))(db)
        rs8 = jnp.full((DB_N,), jnp.float32(1 / 40.0))
        q8 = np.clip(np.asarray(q0, np.float32) * 124, -124, 124).astype(np.int8)
        q8 = jnp.asarray(q8)  # +(i%3) perturbation stays within int8

        @jax.jit
        def rep8(q8, db8, rs8):
            def body(i, acc):
                v, idx = ft(q8 + (i % 3).astype(jnp.int8), db8, DB_N, K, scales=rs8)
                return acc + jnp.sum(v, axis=-1) + idx[:, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros((N_QUERIES,), jnp.float32))

        _ = np.asarray(rep8(q8, db8, rs8))
        t8 = (min(_timed(lambda: np.asarray(rep8(q8, db8, rs8))) for _ in range(3)) - rtt) / REPEATS
        print(f"# tpu int8 scan:  {t8*1e3:.2f} ms/batch ({N_QUERIES/t8:.0f} q/s)",
              file=sys.stderr)
    except Exception as e:
        print(f"# int8 scan skipped: {e}", file=sys.stderr)
    return qps, rec


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def reference_cpu_qps():
    """The reference's dense scan (dbsearch.py:75-81) in torch on host CPU,
    timed on a subsample and scaled to the full DB size."""
    import torch

    sub = 1 << 18  # 262,144 rows (the reference's own block size)
    torch.manual_seed(0)
    db = torch.nn.functional.normalize(torch.randn(sub, DIM))
    q = torch.nn.functional.normalize(torch.randn(N_QUERIES, DIM))
    with torch.no_grad():
        for qi in range(2):
            s = torch.nn.functional.cosine_similarity(db, q[qi:qi + 1], dim=-1)
            torch.topk(s, K, dim=0)
        t0 = time.perf_counter()
        nq_timed = 8
        for qi in range(nq_timed):
            s = torch.nn.functional.cosine_similarity(db, q[qi:qi + 1], dim=-1)
            torch.topk(s, K, dim=0)
        t = time.perf_counter() - t0
    per_query_full_db = (t / nq_timed) * (DB_N / sub)
    print(f"# reference torch-cpu scan: {per_query_full_db*1e3:.1f} ms/query "
          f"(scaled to {DB_N} rows)", file=sys.stderr)
    return 1.0 / per_query_full_db


def _enable_compile_cache():
    """Persistent XLA compilation cache: repeat bench runs skip the ~2 min
    of kernel compiles (and driver runs reuse interactive-session compiles)."""
    try:
        import os

        import jax

        cache_dir = os.environ.get(
            "MERIZO_TPU_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "merizo_tpu", "jax"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        print(f"# compile cache disabled: {e}", file=sys.stderr)


def cpu_fallback_qps():
    """Small-scale CPU measurement of the same engine scan, clearly labelled,
    so a TPU/tunnel outage (e.g. a libtpu version mismatch) still yields a
    recorded benchmark instead of nothing. Runs in a scrubbed subprocess so
    a half-initialised TPU backend in this process can't poison it."""
    import os
    import subprocess

    code = r"""
import sys, time, json
import numpy as np
sys.path.insert(0, "/root/repo")
import jax.numpy as jnp
from merizo_search_tpu.ops.topk import topk_scan
n, d, q = 1 << 20, 128, 64
rng = np.random.default_rng(0)
db = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32))
qq = jnp.asarray(rng.standard_normal((q, d), dtype=np.float32))
v, i = topk_scan(qq, db, n, 100, 1 << 18)
v.block_until_ready()
t0 = time.perf_counter()
for _ in range(3):
    v, i = topk_scan(qq, db, n, 100, 1 << 18)
    v.block_until_ready()
t = (time.perf_counter() - t0) / 3
print(json.dumps({"qps": q / t * (n / (1 << 24))}))
"""
    env = {k: v for k, v in os.environ.items()
           if not (k.startswith(("TPU", "LIBTPU", "CLOUD_TPU", "PJRT"))
                   or k in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME", "XLA_FLAGS"))}
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=600)
    return json.loads(r.stdout.strip().splitlines()[-1])["qps"]


def main():
    _enable_compile_cache()
    try:
        qps, recall = tpu_qps()
        metric = f"exact_search_qps_{DB_N//(1<<20)}M_db_k{K}"
    except Exception as e:
        print(f"# TPU bench failed ({type(e).__name__}: {str(e)[:300]}); "
              f"falling back to a CPU-scaled measurement", file=sys.stderr)
        qps = cpu_fallback_qps()
        metric = f"exact_search_qps_{DB_N//(1<<20)}M_db_k{K}_CPU_FALLBACK"
    try:
        base = reference_cpu_qps()
    except Exception as e:
        print(f"# baseline measurement failed: {e}", file=sys.stderr)
        base = None
    out = {
        "metric": metric,
        "value": round(qps, 2),
        "unit": "queries/s",
        "vs_baseline": round(qps / base, 2) if base else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
