"""Capture an XProf device trace of one fused_topk call and print the
op-level time breakdown (top ops by total device duration).

Usage: python tools/perf_trace.py [bf16|int8] [Q]

The tunnel RTT makes wall-clock timing coarse; the device trace gives
per-op µs so tuning targets the real tail (selection einsums, relayout
copies, final top-k passes) instead of guesses.
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

from merizo_search_tpu.ops import pallas_scan as ps

N, D, K = 1 << 24, 128, 100
MODE = sys.argv[1] if len(sys.argv) > 1 else "bf16"
Q = int(sys.argv[2]) if len(sys.argv) > 2 else 256
TDIR = "/tmp/xprof_trace"


def main():
    kq, kd = jax.random.split(jax.random.PRNGKey(0))
    db = jax.jit(lambda k: jax.random.normal(k, (N, D), jnp.bfloat16))(kd)
    q0 = jax.random.normal(kq, (Q, D), jnp.bfloat16)
    scales = None
    if MODE == "int8":
        db = jax.jit(lambda d: jnp.clip(d * jnp.bfloat16(40), -127, 127)
                     .astype(jnp.int8))(db)
        q0 = jnp.asarray(np.tile(np.arange(-64, 64, dtype=np.int8), (Q, 1)))
        scales = jnp.full((N,), np.float32(1 / 40.0))

    f = jax.jit(lambda q, d: ps.fused_topk(q, d, N, K, scales=scales))
    v, idx = f(q0, db)
    np.asarray(v[:1, :4])  # warm/compile outside the trace

    shutil.rmtree(TDIR, ignore_errors=True)
    with jax.profiler.trace(TDIR):
        v, idx = f(q0, db)
        np.asarray(v[:1, :4])

    traces = glob.glob(TDIR + "/**/*.trace.json.gz", recursive=True)
    if not traces:
        print("no trace captured"); return
    with gzip.open(traces[-1], "rt") as fh:
        data = json.load(fh)

    # keep only TPU-core trace events (host threads also emit events)
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
    print(f"# {MODE} Q={Q}: top device ops (us total, count)")
    s = 0.0
    for name, us in items[:40]:
        s += us
        print(f"{us:10.0f}  x{cnt[name]:<4d} {name[:100]}")
    print(f"# shown {s:.0f} us of {sum(tot.values()):.0f} us total")


if __name__ == "__main__":
    main()
