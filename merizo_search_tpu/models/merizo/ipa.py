"""Invariant Point Attention encoder in JAX.

Reimplements the behaviour of the reference IPA stack
(programs/Merizo/model/ipa/nndef_ipa.py:37-278 and ipa_encoder.py:6-62):
6 weight-shared IPA iterations with c_s=512, c_z=32, 16 heads, 4 query/8
value points, rotary embeddings on the scalar q/k, an extra pair-value output
path, and a bidirectional-GRU transition.

TPU-first differences (same numerics):
- The point-attention term is computed by norm expansion
  sum_p |q_ip - k_jp|^2 = |q_i|^2 + |k_j|^2 - 2 q_i.k_j
  as one MXU einsum instead of materialising the reference's
  [N, N, H, P, 3] displacement tensor (nndef_ipa.py:199-204) — O(N^2 H) HBM
  instead of O(N^2 H P 3).
- Rigid frames are two einsums (models/merizo/rigid.py), not a class algebra.
- All sequence ops are masked so padded batches jit once per bucket.

Quirk preserved for checkpoint parity: the reference applies
rotary_embedding_torch's rotate_queries_or_keys to tensors shaped [B, N, H, C]
whose dim -2 is the *head* axis, so the rotary "positions" are the 16 head
indices, identical for every residue (nndef_ipa.py:111,184-185). We bake the
same 16 fixed rotations.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import rigid
from ...ops.gru import bigru

C_S = 512
C_Z = 32
C_HIDDEN = 512
N_HEADS = 16
N_QK_POINTS = 4
N_V_POINTS = 8
N_BLOCKS = 6
INF = 1e5
EPS = 1e-8

# matmul precision for fp32 on TPU (bf16 rounding moves domain boundaries)
PRECISION = jax.lax.Precision.HIGHEST


def _rotary_tables(n_pos: int = N_HEADS, dim: int = C_HIDDEN // 2):
    """cos/sin tables [n_pos, dim] matching rotary_embedding_torch defaults
    (theta=10000, interleaved pairs)."""
    inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    freqs = np.einsum("i,j->ij", np.arange(n_pos, dtype=np.float32), inv)
    freqs = np.repeat(freqs, 2, axis=-1)  # [n_pos, dim]
    return np.cos(freqs), np.sin(freqs)


_ROT_COS, _ROT_SIN = _rotary_tables()


def _rotary(x):
    """Rotate the first C_HIDDEN//2 channels of x [B,N,H,C] with per-head
    angles (see module docstring quirk)."""
    rot_dim = _ROT_COS.shape[-1]
    t_rot, t_pass = x[..., :rot_dim], x[..., rot_dim:]
    x1 = t_rot[..., 0::2]
    x2 = t_rot[..., 1::2]
    half = jnp.stack([-x2, x1], axis=-1).reshape(t_rot.shape)
    t_rot = t_rot * _ROT_COS + half * _ROT_SIN
    return jnp.concatenate([t_rot, t_pass], axis=-1)


def _lin(p, x):
    return x @ p["w"] + p["b"] if "b" in p else x @ p["w"]


def _ln(p, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["w"] + p["b"]


def ipa_attention(p, s, z, R, t, mask):
    """One IPA iteration. s [B,N,C_S], z [B,N,N,C_Z], R [B,N,3,3], t [B,N,3],
    mask [B,N]. Returns the residual update [B,N,C_S]."""
    b, n, _ = s.shape
    h, c = N_HEADS, C_HIDDEN

    q = _lin(p["q"], s).reshape(b, n, h, c)
    kv = _lin(p["kv"], s).reshape(b, n, h, 2 * c)
    k, v = jnp.split(kv, 2, axis=-1)

    def to_points(flat, npts):
        # reference layout: thirds of the last dim are x, y, z (nndef_ipa.py:153-156)
        pts = jnp.stack(jnp.split(flat, 3, axis=-1), axis=-1)  # [B,N,H*P,3]
        pts = rigid.apply(R[:, :, None], t[:, :, None], pts)
        return pts.reshape(b, n, h, npts, 3)

    q_pts = to_points(_lin(p["q_pts"], s), N_QK_POINTS)
    kv_pts_flat = _lin(p["kv_pts"], s)
    kv_pts = jnp.stack(jnp.split(kv_pts_flat, 3, axis=-1), axis=-1)
    kv_pts = rigid.apply(R[:, :, None], t[:, :, None], kv_pts)
    kv_pts = kv_pts.reshape(b, n, h, N_QK_POINTS + N_V_POINTS, 3)
    k_pts, v_pts = jnp.split(kv_pts, [N_QK_POINTS], axis=-2)

    q = _rotary(q)
    k = _rotary(k)

    a = jnp.einsum("bihc,bjhc->bhij", q, k, precision=PRECISION)
    a = a * math.sqrt(1.0 / (3 * c))

    bias = _lin(p["b"], z)  # [B,N,N,H]
    a = a + math.sqrt(1.0 / 3) * jnp.moveaxis(bias, -1, 1)

    # point attention via norm expansion (no [N,N,H,P,3] tensor)
    qn = jnp.sum(q_pts ** 2, axis=(-1, -2))          # [B,N,H]
    kn = jnp.sum(k_pts ** 2, axis=(-1, -2))
    cross = jnp.einsum("bihpc,bjhpc->bhij", q_pts, k_pts, precision=PRECISION)
    pt_att = qn[:, :, None, :].transpose(0, 3, 1, 2) + \
        kn[:, None, :, :].transpose(0, 3, 1, 2) - 2.0 * cross   # [B,H,N,N]
    head_w = jax.nn.softplus(p["head_weights"]) * math.sqrt(
        1.0 / (3 * (N_QK_POINTS * 9.0 / 2)))
    a = a + (-0.5) * head_w[None, :, None, None] * pt_att

    sq_mask = INF * (mask[:, :, None] * mask[:, None, :] - 1.0)
    a = a + sq_mask[:, None, :, :]
    a = jax.nn.softmax(a, axis=-1)

    o = jnp.einsum("bhij,bjhc->bihc", a, v, precision=PRECISION).reshape(b, n, h * c)
    s_out = _lin(p["hidden_out"], o)

    o_pair = jnp.einsum("bhij,bijc->bihc", a, z, precision=PRECISION).reshape(b, n, h * C_Z)
    s_out = s_out + _lin(p["pair_out"], o_pair)

    o_pt = jnp.einsum("bhij,bjhpc->bihpc", a, v_pts, precision=PRECISION)
    o_pt = rigid.invert_apply(R[:, :, None, None], t[:, :, None, None], o_pt)
    o_pt_norm = jnp.sqrt(jnp.sum(o_pt ** 2, axis=-1) + EPS).reshape(b, n, h * N_V_POINTS)
    # reference flattening: [B,N,H*Pv,3] -> concat of x, y, z blocks
    o_pt_flat = o_pt.reshape(b, n, h * N_V_POINTS, 3)
    o_pt_flat = jnp.concatenate([o_pt_flat[..., 0], o_pt_flat[..., 1], o_pt_flat[..., 2]], axis=-1)
    s_out = s_out + _lin(p["points_out"], o_pt_flat)
    s_out = s_out + _lin(p["points_norm_out"], o_pt_norm)
    return s_out


def transition(p, s, mask):
    """StructureModuleTransition: one 2-layer bidirectional GRU + LayerNorm
    (nndef_ipa.py:7-34)."""
    out, _ = bigru(p["gru"], s, mask)
    return _ln(p["ln"], out)


def ipa_encoder(p, s, z, R, t, mask):
    """The full encoder block (ipa_encoder.py:44-62): input norms + shared-
    weight IPA loop. Returns s [B,N,C_S]."""
    s = _ln(p["ln_s"], s)
    s = _lin(p["linear_in"], s)
    z = _ln(p["ln_z"], z)

    def body(s, _):
        s_ = ipa_attention(p["ipa"], s, z, R, t, mask)
        s = _ln(p["ln_ipa"], s + s_)
        s = transition(p["transition"], s, mask)
        return s, None

    s, _ = jax.lax.scan(body, s, None, length=N_BLOCKS)
    return s
