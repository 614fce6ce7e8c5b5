"""IVF recall@k-vs-nprobe + QPS curve artifact (VERDICT r2 item 6).

Builds a balanced IVF over clustered synthetic unit vectors (mixture of
Gaussians — the regime where sublinear probing pays; uniform random data
has no cluster structure and needs nprobe ~ nlist), measures recall@k
against the exact scan and queries/sec per nprobe, and writes
IVF_CURVE.json at the repo root.

Usage: python tools/ivf_curve.py [log2_N] [nlist]
Defaults: N = 2^20 rows, nlist = 1024, k = 100, on whatever backend JAX
picks (TPU via axon here; CPU works for recall, qps is then meaningless).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp

# persistent compile cache: a rerun after a tunnel hiccup skips straight to
# where it died instead of re-paying every remote compile
_cache = os.environ.get("MERIZO_TPU_CACHE",
                        os.path.expanduser("~/.cache/merizo_tpu/jax"))
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from _bench_util import bench
from merizo_search_tpu.search import ivf as ivf_mod

N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
NLIST = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
D, K, Q = 128, 100, 256
NCENTERS = max(64, NLIST // 4)

rng = np.random.default_rng(0)
centers = rng.normal(size=(NCENTERS, D)).astype(np.float32) * 3
emb = (centers[rng.integers(0, NCENTERS, N)]
       + rng.normal(size=(N, D)).astype(np.float32))
emb /= np.linalg.norm(emb, axis=1, keepdims=True)
q = emb[rng.choice(N, Q, replace=False)].copy()
q += rng.normal(size=q.shape).astype(np.float32) * 0.05
q /= np.linalg.norm(q, axis=1, keepdims=True)

EXPAND = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25

print(f"# N={N}, nlist={NLIST}, Q={Q}, K={K}, expand={EXPAND}, "
      f"backend={jax.default_backend()}")
t0 = time.time()
ivf = ivf_mod.build_ivf(emb, NLIST, expand=EXPAND)
build_s = time.time() - t0
nlist = ivf["nlist"]
dedup = ivf["dup"]
dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
dbp = jax.device_put(jnp.asarray(
    ivf_mod.permute_db(emb, ivf, np.dtype("bfloat16")
                       if dtype == jnp.bfloat16 else np.float32)))
cent = jax.device_put(jnp.asarray(ivf["centroids"]))
perm = jax.device_put(jnp.asarray(ivf["perm"]))
dq = jax.device_put(jnp.asarray(q).astype(dtype))
interp = jax.default_backend() != "tpu"

# exact reference ranking (host, f64-stable)
s = q.astype(np.float64) @ emb.T.astype(np.float64)
ref = np.argsort(-s, axis=1)[:, :K]

# f32 rerank sidecar (exact rescore of the top-(k+1) scanned blocks):
# removes the storage-dtype ranking noise that otherwise caps recall at
# ~0.98 (bf16). Sized N*D*4 bytes; the qps column states its cost.
dbp_hi = jax.device_put(jnp.asarray(ivf_mod.permute_db(emb, ivf, np.float32)))
dq_hi = jax.device_put(jnp.asarray(q))

from functools import partial


@partial(jax.jit, static_argnames=("nprobe", "rerank"))
def _search(dq, dbp, cent, perm, dbph, dqh, nprobe, rerank):
    # one jitted program per (nprobe, rerank): the eager path dispatches
    # hundreds of ops individually through the ~25 ms tunnel (minutes per
    # point, and long eager streaks have wedged the compile relay)
    kw = {"rerank_hi": dbph, "q_hi": dqh} if rerank else {}
    return ivf_mod.ivf_search(dq, dbp, cent, perm, K, nprobe,
                              interpret=interp, dedup=dedup, **kw)


points = []
for nprobe in (4, 8, 16, 32, 64, 128):
    if nprobe > nlist:
        break
    row = {"nprobe": nprobe,
           "db_fraction_probed": round(nprobe / nlist, 4)}
    for tag, kw in (("", {}), ("rerank_", {"rerank_hi": dbp_hi,
                                           "q_hi": dq_hi})):
        v, idx = _search(dq, dbp, cent, perm, dbp_hi, dq_hi, nprobe,
                         rerank=bool(kw))
        idx = np.asarray(idx)
        recall = float(np.mean([len(set(idx[r]) & set(ref[r])) / K
                                for r in range(Q)]))

        # CRITICAL: the f32 sidecar must be a bench ARG, not a closure
        # default — jit serialises closed-over device arrays as constants
        # in the remote compile request, and a 672 MB constant kills the
        # compile relay (HTTP 413 / broken pipe)
        def probe_fn(i, dq, dbp, cent, perm, dbph, dqh, rer=bool(kw)):
            qq = jnp.roll(dq, i, axis=0)
            v, ix = _search(qq, dbp, cent, perm, dbph, dqh, nprobe,
                            rerank=rer)
            return jnp.sum(v) + jnp.sum(ix[:, 0].astype(jnp.float32))

        # steady state: one extra warm sweep beyond bench's own
        # compile+warm round (the r3 curve showed nprobe=4 slower than 8 —
        # warmup noise)
        t = min(bench(probe_fn, dq, dbp, cent, perm, dbp_hi, dq_hi, rep=16),
                bench(probe_fn, dq, dbp, cent, perm, dbp_hi, dq_hi, rep=16))
        qps = Q / t
        row[tag + "recall_at_100"] = round(recall, 4)
        row[tag + "qps"] = round(qps, 1)
    points.append(row)
    print(f"nprobe={nprobe:4d}  recall@100={row['recall_at_100']:.4f}  "
          f"qps={row['qps']:9.1f}  rerank: {row['rerank_recall_at_100']:.4f}"
          f" @ {row['rerank_qps']:9.1f}  "
          f"({row['db_fraction_probed']*100:.1f}% of DB probed)")

out = {
    "config": {"N": N, "D": D, "nlist": nlist, "k": K, "q_batch": Q,
               "expand": EXPAND, "multi_assignment": bool(dedup),
               "dtype": str(dtype.__name__), "backend": jax.default_backend(),
               "data": f"mixture of {NCENTERS} gaussian clusters, unit-norm",
               "build_seconds": round(build_s, 1),
               "rerank": "f32 sidecar (N*D*4 bytes) rescoring the top-(k+1) scanned blocks exactly",
               "memory_bound": "device-resident only: permuted DB must fit "
                               "the mesh HBM budget (engine gates with an "
                               "error otherwise)"},
    "points": points,
}
with open("/root/repo/IVF_CURVE.json", "w") as fh:
    json.dump(out, fh, indent=1)
print("wrote /root/repo/IVF_CURVE.json")
