"""XProf device trace of one Merizo forward_features call: op-level µs
breakdown at a given residue count (default 775 -> bucket 1024).

Usage: python tools/perf_trace_merizo.py [nres]

Same rationale as perf_trace.py: the tunnel RTT makes wall-clock timing
coarse; the device trace attributes time to the real ops (GRU scan steps,
IPA einsums, layernorms) so model-side tuning targets the dominant cost.
"""

import glob
import gzip
import json
import shutil
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from merizo_search_tpu.models.merizo import network as mznet
from merizo_search_tpu.utils.bucketing import bucket_for

NRES = int(sys.argv[1]) if len(sys.argv) > 1 else 775
TDIR = "/tmp/xprof_trace_merizo"


def main():
    params = jax.jit(mznet.init_params)(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    n = bucket_for(NRES)
    s = jnp.asarray(rng.normal(size=(1, n, 20)).astype(np.float32))
    coords = np.cumsum(rng.normal(size=(n, 3)) * 2.0, axis=0)
    d = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
    z = jnp.asarray(d.reshape(1, n, n, 1).astype(np.float32))
    r = jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32),
                                    (1, n, 3, 3)).copy())
    t = jnp.asarray(coords.reshape(1, n, 3).astype(np.float32))
    ri = jnp.asarray(np.arange(n, dtype=np.float32).reshape(1, n))
    mask = np.ones((1, n), np.float32)
    mask[:, NRES:] = 0.0
    mask = jnp.asarray(mask)

    f = jax.jit(mznet.forward_features)
    out = f(params, s, z, r, t, ri, mask)
    np.asarray(out[0][:1, :1, :1])  # warm/compile outside the trace

    shutil.rmtree(TDIR, ignore_errors=True)
    with jax.profiler.trace(TDIR):
        out = f(params, s, z, r, t, ri, mask)
        np.asarray(out[0][:1, :1, :1])

    traces = glob.glob(TDIR + "/**/*.trace.json.gz", recursive=True)
    if not traces:
        print("no trace captured"); return
    with gzip.open(traces[-1], "rt") as fh:
        data = json.load(fh)

    pids = {p["pid"] for p in data["traceEvents"]
            if p.get("ph") == "M" and p.get("name") == "process_name"
            and "TPU" in str(p.get("args", {}).get("name", ""))
            and "XLA" not in str(p.get("args", {}).get("name", ""))}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in pids and "dur" in e:
            tot[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    items = sorted(tot.items(), key=lambda kv: -kv[1])
    print(f"# merizo forward nres={NRES} bucket={n}: top device ops "
          f"(us total, count)")
    shown = 0.0
    for name, us in items[:40]:
        shown += us
        print(f"{us:10.0f}  x{cnt[name]:<4d} {name[:110]}")
    print(f"# shown {shown:.0f} us of {sum(tot.values()):.0f} us total")


if __name__ == "__main__":
    main()
