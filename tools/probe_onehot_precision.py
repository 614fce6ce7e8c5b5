"""Empirical check: is a one-hot fp32 matmul gather bit-exact on TPU at
each matmul precision?  Determines the correct ONEHOT_PRECISION setting in
merizo_search_tpu/ops/pallas_scan.py (integer gathers of block ids must be
exact up to the largest per-device block count; f32 value gathers must be
bit-exact for the kernel's brute-force-parity claim).

The one-hot is built from RUNTIME indices inside the jit — exactly the
kernel's _gather_int pattern — so XLA cannot constant-fold or
identity-simplify the product away (a constant arange one-hot gets folded
and reports spurious exactness at every precision).

Run on the live TPU:  python -u tools/probe_onehot_precision.py
"""
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

Q, K, W = 8, 128, 512


@partial(jax.jit, static_argnames=("prec",))
def gather(sel, src, prec):
    onehot = (sel[:, :, None] == jnp.arange(W)[None, None, :]).astype(jnp.float32)
    return jnp.einsum("qkw,qw->qk", onehot, src,
                      preferred_element_type=jnp.float32, precision=prec)


def probe_int(prec, exps, rng):
    """Exactness of the gather for integer f32 values around each 2^e."""
    sel = jnp.asarray(rng.integers(0, W, size=(Q, K)).astype(np.int32))
    results = {}
    for e in exps:
        base = 1 << e
        vals = rng.integers(max(base - 4, 0), base + 300, size=(Q, W))
        vals = vals.astype(np.float64)
        src = jnp.asarray(vals.astype(np.float32))
        out = np.asarray(gather(sel, src, prec))
        want = np.take_along_axis(np.asarray(src), np.asarray(sel), axis=1)
        results[e] = bool(np.array_equal(out, want))
    return results


def probe_f32(prec, rng):
    """Mismatch count / max relative error for random-magnitude f32."""
    sel = jnp.asarray(rng.integers(0, W, size=(Q, K)).astype(np.int32))
    vals = (rng.standard_normal((Q, W)) *
            rng.choice([1e-3, 1.0, 1e3], size=(Q, W))).astype(np.float32)
    src = jnp.asarray(vals)
    out = np.asarray(gather(sel, src, prec))
    want = np.take_along_axis(vals, np.asarray(sel), axis=1)
    err = np.abs(out - want) / np.maximum(np.abs(want), 1e-30)
    return float(err.max()), int((out != want).sum()), Q * K


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    exps = [15, 16, 17, 18, 20, 22, 24]
    for name, prec in [("DEFAULT", jax.lax.Precision.DEFAULT),
                       ("HIGH", jax.lax.Precision.HIGH),
                       ("HIGHEST", jax.lax.Precision.HIGHEST)]:
        ints = probe_int(prec, exps, rng)
        maxrel, nbad, tot = probe_f32(prec, rng)
        intstr = " ".join(f"2^{e}:{'OK' if ok else 'X'}" for e, ok in ints.items())
        print(f"{name:8s} int-exact around {intstr} | f32 gather: "
              f"{nbad}/{tot} mismatched, max rel err {maxrel:.3e}", flush=True)


if __name__ == "__main__":
    main()
