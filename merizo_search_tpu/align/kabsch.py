"""Batched weighted Kabsch superposition (JAX).

Replaces the reference's TM-align C++ binary's superposition core. Solves for
the rigid transform (R, t) minimising weighted RMSD between paired point sets
using the SVD formulation; fully batched over alignment candidates so
thousands of superpositions run as one [B,3,3] SVD on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kabsch(p, q, w):
    """Optimal rigid transform mapping p onto q (both [..., N, 3]), weighted
    by w [..., N] (>=0; zero rows are ignored).

    Returns (R [...,3,3], t [...,3]) such that p @ R.T + t ~= q.
    """
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    wn = w / jnp.maximum(wsum, 1e-9)
    mu_p = jnp.sum(p * wn[..., None], axis=-2)
    mu_q = jnp.sum(q * wn[..., None], axis=-2)
    pc = p - mu_p[..., None, :]
    qc = q - mu_q[..., None, :]
    # covariance [...,3,3]
    h = jnp.einsum("...ni,...nj->...ij", pc * wn[..., None], qc)
    u, s, vt = jnp.linalg.svd(h, full_matrices=False)
    v = jnp.swapaxes(vt, -1, -2)
    det = jnp.linalg.det(v @ jnp.swapaxes(u, -1, -2))
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    r = (v * d[..., None, :]) @ jnp.swapaxes(u, -1, -2)  # R = V diag(1,1,det) U^T
    t = mu_q - jnp.einsum("...ij,...j->...i", r, mu_p)
    return r, t


def transform(r, t, p):
    """Apply (R, t) to points p [..., N, 3]."""
    return jnp.einsum("...ij,...nj->...ni", r, p) + t[..., None, :]


def weighted_rmsd(p, q, w):
    """RMSD between p and q over weights w after NO superposition."""
    d2 = jnp.sum((p - q) ** 2, axis=-1)
    wsum = jnp.maximum(jnp.sum(w, axis=-1), 1e-9)
    return jnp.sqrt(jnp.sum(d2 * w, axis=-1) / wsum)
