"""Empirical check: is a one-hot fp32 matmul bit-exact on TPU at each
matmul precision?  Determines the correct ONEHOT_PRECISION setting for
merizo_search_tpu/ops/pallas_scan.py (integer gathers of block ids must be
exact up to the largest per-device block count; f32 value gathers must be
bit-exact for the kernel's brute-force-parity claim).

Run on the live TPU:  python tools/probe_onehot_precision.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def probe_int(prec, exps):
    """Largest power-of-two neighbourhood where one-hot @ f32 reproduces
    integers exactly."""
    results = {}
    for e in exps:
        base = 1 << e
        # test the worst cases around 2^e: values needing e+1 mantissa bits
        vals = np.arange(base - 4, base + 260, dtype=np.float64)
        vals = vals[vals >= 0]
        src = jnp.asarray(vals.astype(np.float32))[None, :]  # [1, W]
        w = src.shape[1]
        sel = jnp.arange(w, dtype=jnp.int32)[None, :]
        onehot = (sel[:, :, None] == jnp.arange(w)[None, None, :]).astype(jnp.float32)
        out = jax.jit(lambda oh, s: jnp.einsum(
            "qkw,qw->qk", oh, s, preferred_element_type=jnp.float32,
            precision=prec))(onehot, src)
        exact = bool(np.array_equal(np.asarray(out)[0], np.asarray(src)[0]))
        results[e] = exact
    return results


def probe_f32(prec):
    """Max relative error of one-hot @ f32 for random f32 values."""
    rng = np.random.default_rng(0)
    vals = rng.standard_normal(4096).astype(np.float32) * rng.choice(
        [1e-3, 1.0, 1e3], size=4096).astype(np.float32)
    src = jnp.asarray(vals)[None, :]
    sel = jnp.arange(4096, dtype=jnp.int32)[None, :]
    onehot = (sel[:, :, None] == jnp.arange(4096)[None, None, :]).astype(jnp.float32)
    out = jax.jit(lambda oh, s: jnp.einsum(
        "qkw,qw->qk", oh, s, preferred_element_type=jnp.float32,
        precision=prec))(onehot, src)
    o = np.asarray(out)[0]
    err = np.abs(o - vals) / np.maximum(np.abs(vals), 1e-30)
    nbad = int((o != vals).sum())
    return float(err.max()), nbad


def main():
    print("devices:", jax.devices())
    exps = [15, 16, 17, 18, 20, 22, 24]
    for name, prec in [("DEFAULT", jax.lax.Precision.DEFAULT),
                       ("HIGH", jax.lax.Precision.HIGH),
                       ("HIGHEST", jax.lax.Precision.HIGHEST)]:
        ints = probe_int(prec, exps)
        maxrel, nbad = probe_f32(prec)
        intstr = " ".join(f"2^{e}:{'OK' if ok else 'X'}" for e, ok in ints.items())
        print(f"{name:8s} int-exact around {intstr} | f32 gather: "
              f"{nbad}/4096 mismatched, max rel err {maxrel:.3e}")


if __name__ == "__main__":
    main()
