"""Masked multi-layer bidirectional GRU with torch-compatible semantics.

The reference Merizo uses torch nn.GRU in three places (all bidirectional,
batch_first): the IPA transition (nndef_ipa.py:7-34, 2 layers, hidden c/2),
the decoder background head (mask_decoder.py:123-132) and the per-domain
confidence heads (mask_decoder.py:135-154). Torch runs them on exact-length
sequences; under jit we run padded sequences with a mask:

- forward direction: a lax.scan whose carry holds the state through masked
  steps (pads are trailing, so valid outputs are untouched);
- reverse direction: flip the padded sequence (pads become leading; the held
  initial state passes through them), scan, flip back.

Gate math matches torch exactly (gate order r,z,n; the reset gate multiplies
the *projected* hidden term: n = tanh(W_in x + b_in + r*(W_hn h + b_hn))).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gru_cell_pre(gi, h, wh, bh):
    """GRU step with the input projection gi = x_t @ wi + bi precomputed."""
    gh = h @ wh + bh
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def _scan_dir(x, mask, wi, wh, bi, bh):
    """Masked unidirectional scan. x [B,T,I], mask [B,T] -> (out [B,T,H], h_T).

    Reference implementation: the production path is the direction-batched
    `_scan_bidir` below; this single-direction scan is kept as the readable
    spec and is pinned against it by tests/test_gru.py (parity test), so the
    two cannot silently drift.

    The input projections for ALL timesteps run as one batched MXU matmul
    before the scan; only the inherently sequential recurrent product stays
    inside, halving the sequential critical path."""
    b = x.shape[0]
    h0 = jnp.zeros((b, wh.shape[0]), x.dtype)
    gi_all = x @ wi + bi                                  # [B,T,3H]

    def step(h, inp):
        gi_t, m_t = inp
        h_new = _gru_cell_pre(gi_t, h, wh, bh)
        h = m_t[:, None] * h_new + (1.0 - m_t[:, None]) * h
        return h, h

    hT, outs = jax.lax.scan(
        step, h0, (jnp.moveaxis(gi_all, 0, 1), jnp.moveaxis(mask, 0, 1)))
    return jnp.moveaxis(outs, 0, 1), hT


SCAN_UNROLL = 8   # while-loop iteration overhead dominates the tiny recurrent
                 # matmul; unrolling cuts the trip count 8x


def _scan_bidir(x, mask, layer):
    """Both directions in ONE direction-batched scan.

    The fwd and reverse scans are independent, so they run as a single
    lax.scan over direction-stacked tensors ([2, B, ...], per-direction
    weights applied with a batched einsum) — half the sequential while
    loops, and the per-step matmul is twice as large (better MXU shape).
    Returns (out [B,T,2H], h_last_reverse [B,H])."""
    b = x.shape[0]
    xs = jnp.stack([x, jnp.flip(x, axis=1)])              # [2,B,T,I]
    ms = jnp.stack([mask, jnp.flip(mask, axis=1)])        # [2,B,T]
    wi = jnp.stack([layer["wi_f"], layer["wi_b"]])        # [2,I,3H]
    wh = jnp.stack([layer["wh_f"], layer["wh_b"]])        # [2,H,3H]
    bi = jnp.stack([layer["bi_f"], layer["bi_b"]])        # [2,3H]
    bh = jnp.stack([layer["bh_f"], layer["bh_b"]])
    hdim = wh.shape[1]
    # input projections for all steps: one batched MXU matmul
    gi_all = jnp.einsum("dbti,dik->dbtk", xs, wi) + bi[:, None, None, :]
    h0 = jnp.zeros((2, b, hdim), x.dtype)

    def step(h, inp):
        gi_t, m_t = inp                                   # [2,B,3H], [2,B]
        gh = jnp.einsum("dbh,dhk->dbk", h, wh) + bh[:, None, :]
        i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        h = m_t[..., None] * h_new + (1.0 - m_t[..., None]) * h
        return h, h

    hT, outs = jax.lax.scan(step, h0,
                            (jnp.moveaxis(gi_all, 2, 0),  # [T,2,B,3H]
                             jnp.moveaxis(ms, 2, 0)),
                            unroll=SCAN_UNROLL)
    outs = jnp.moveaxis(outs, 0, 2)                       # [2,B,T,H]
    out = jnp.concatenate([outs[0], jnp.flip(outs[1], axis=1)], axis=-1)
    return out, hT[1]


def bigru(params: list[dict], x, mask):
    """Bidirectional multi-layer GRU.

    params: one dict per layer with keys wi_f, wh_f, bi_f, bh_f (forward) and
    wi_b, wh_b, bi_b, bh_b (reverse); weights stored [in, 3H] / [H, 3H].

    Returns (outputs [B,T,2H], h_last_reverse_top [B,H]) — the second value is
    the final hidden state of the top layer's reverse direction (torch's
    h_n[-1], used by the confidence head).
    """
    out = x
    h_rev_last = None
    for layer in params:
        out, h_rev_last = _scan_bidir(out, mask, layer)
    return out, h_rev_last


def gru_params_from_torch(sd: dict, prefix: str, num_layers: int) -> list[dict]:
    """Convert torch nn.GRU state_dict entries to our layout.

    Torch keys: {prefix}.weight_ih_l{k}[_reverse] [3H, in], weight_hh_l{k}
    [3H, H], bias_ih_l{k}, bias_hh_l{k} [3H].
    """
    def arr(k):
        v = sd[k]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return jnp.asarray(v, jnp.float32)

    layers = []
    for k in range(num_layers):
        layers.append({
            "wi_f": arr(f"{prefix}.weight_ih_l{k}").T,
            "wh_f": arr(f"{prefix}.weight_hh_l{k}").T,
            "bi_f": arr(f"{prefix}.bias_ih_l{k}"),
            "bh_f": arr(f"{prefix}.bias_hh_l{k}"),
            "wi_b": arr(f"{prefix}.weight_ih_l{k}_reverse").T,
            "wh_b": arr(f"{prefix}.weight_hh_l{k}_reverse").T,
            "bi_b": arr(f"{prefix}.bias_ih_l{k}_reverse"),
            "bh_b": arr(f"{prefix}.bias_hh_l{k}_reverse"),
        })
    return layers


def gru_params_init(key, input_size: int, hidden: int, num_layers: int) -> list[dict]:
    """Random init matching torch GRU's U(-1/sqrt(H), 1/sqrt(H))."""
    bound = 1.0 / np.sqrt(hidden)
    layers = []
    for k in range(num_layers):
        isz = input_size if k == 0 else 2 * hidden
        layer = {}
        for d in ("f", "b"):
            key, *ks = jax.random.split(key, 5)
            layer[f"wi_{d}"] = jax.random.uniform(ks[0], (isz, 3 * hidden), jnp.float32, -bound, bound)
            layer[f"wh_{d}"] = jax.random.uniform(ks[1], (hidden, 3 * hidden), jnp.float32, -bound, bound)
            layer[f"bi_{d}"] = jax.random.uniform(ks[2], (3 * hidden,), jnp.float32, -bound, bound)
            layer[f"bh_{d}"] = jax.random.uniform(ks[3], (3 * hidden,), jnp.float32, -bound, bound)
        layers.append(layer)
    return layers
