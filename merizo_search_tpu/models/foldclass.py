"""Foldclass EGNN embedder in JAX.

Reimplements the behaviour of the reference FoldClassNet
(programs/Foldclass/nndef_fold_egnn_embed.py:34-62 and
my_egnn_nocoords.py:10-74): a fixed sinusoidal positional encoding as the node
features, two EGNN layers whose edge feature is the squared CA-CA distance
(coordinates are never updated), and a mean-pool over residues producing a
128-d embedding.

TPU-first design differences from the reference (same numerics):

- **Batched and masked.** The reference embeds one structure at a time
  (makedb.py:75-79). Here `embed()` takes [B, N, 3] with a validity mask so
  structures are bucketed by length and batched onto the MXU.

- **Split edge projection.** The reference materialises the [N, N, 2d+1]
  concat ([f_i, f_j, d2]) and pushes it through a Linear. Because the first
  edge Linear is block-separable, we precompute per-node projections
  A = F @ W[:d], Bp = F @ W[d:2d] (two O(N) matmuls) and form the pair hidden
  as A_i + B_j + w_d * d2_ij + b — the O(N^2) concat and O(N^2 * 2d * 2d)
  matmul disappear entirely.

- **Blocked pair stage.** The [N, N, hidden] tensor is never materialised in
  HBM: a lax.scan over row blocks computes messages and accumulates their
  masked sum, bounding peak memory at [B, block, N, hidden].

Numerical parity with the torch reference is tested against captured goldens
(tests/test_foldclass.py) to <=1e-4.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

EMBED_DIM = 128
PE_MAX_LEN = 3000


def sinusoidal_pe(max_len: int = PE_MAX_LEN, d_model: int = EMBED_DIM) -> np.ndarray:
    """Fixed sinusoidal positional encoding table [max_len, d_model].

    Parity: nndef_fold_egnn_embed.py:10-30 (PositionalEncoder, learned=False).
    """
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


def init_params(key, dim: int = EMBED_DIM, n_layers: int = 2, init_eps: float = 1e-3) -> dict:
    """Random init matching the reference's nn.init.normal_(std=1e-3) on all
    Linear weights and torch's default uniform bias init
    (my_egnn_nocoords.py:36-42)."""
    m_dim = dim * 2
    e_in = 2 * dim + 1

    def linear(key, fan_in, fan_out):
        kw, kb = jax.random.split(key)
        w = jax.random.normal(kw, (fan_in, fan_out), jnp.float32) * init_eps
        bound = 1.0 / math.sqrt(fan_in)
        b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
        return {"w": w, "b": b}

    layers = []
    for _ in range(n_layers):
        keys = jax.random.split(key, 6)
        key = keys[-1]
        layers.append({
            "edge0": linear(keys[0], e_in, e_in * 2),
            "edge1": linear(keys[1], e_in * 2, m_dim),
            "gate": linear(keys[2], m_dim, 1),
            "node0": linear(keys[3], dim + m_dim, dim * 2),
            "node1": linear(keys[4], dim * 2, dim),
        })
    return {"layers": layers, "pe": jnp.asarray(sinusoidal_pe(PE_MAX_LEN, dim))}


def _egnn_layer(layer: dict, feats, d2, mask, block: int, dim: int):
    """One EGNN layer. feats [B,N,D], d2 [B,N,N], mask [B,N] -> [B,N,D]."""
    w0, b0 = layer["edge0"]["w"], layer["edge0"]["b"]
    # split the first edge Linear: rows [0:D] act on f_i, [D:2D] on f_j, [2D] on d2
    a_i = feats @ w0[:dim]                     # [B,N,2e]
    b_j = feats @ w0[dim:2 * dim]              # [B,N,2e]
    w_d = w0[2 * dim]                          # [2e]

    w1, b1 = layer["edge1"]["w"], layer["edge1"]["b"]
    wg, bg = layer["gate"]["w"], layer["gate"]["b"]

    n = feats.shape[1]
    nblk = n // block
    mask_j = mask[:, None, :, None]            # [B,1,N,1]

    def row_block(carry, ib):
        a_blk = jax.lax.dynamic_slice_in_dim(a_i, ib * block, block, axis=1)
        d2_blk = jax.lax.dynamic_slice_in_dim(d2, ib * block, block, axis=1)
        hidden = jax.nn.silu(a_blk[:, :, None, :] + b_j[:, None, :, :]
                             + d2_blk[..., None] * w_d + b0)
        m = jax.nn.silu(hidden @ w1 + b1)      # [B,blk,N,m_dim]
        m = m * jax.nn.sigmoid(m @ wg + bg)    # edge gate
        m_i = jnp.sum(m * mask_j, axis=2)      # masked sum over j -> [B,blk,m_dim]
        return carry, m_i

    _, m_rows = jax.lax.scan(row_block, None, jnp.arange(nblk))
    # m_rows: [nblk, B, block, m_dim] -> [B, N, m_dim]
    m_i = jnp.moveaxis(m_rows, 0, 1).reshape(feats.shape[0], n, -1)

    node_in = jnp.concatenate([feats, m_i], axis=-1)
    h = jax.nn.silu(node_in @ layer["node0"]["w"] + layer["node0"]["b"])
    out = h @ layer["node1"]["w"] + layer["node1"]["b"]
    return out + feats


def _choose_block(n: int) -> int:
    """Row-block size: bound the [B, block, N, 2e] pair tile to ~64M floats."""
    target = max(1, (1 << 26) // max(1, n * 514))
    blk = 1
    while blk * 2 <= target and n % (blk * 2) == 0:
        blk *= 2
    return blk


@partial(jax.jit, static_argnames=("block",))
def _embed_impl(params, coords, mask, block):
    dim = params["pe"].shape[1]
    n = coords.shape[1]
    feats = jnp.broadcast_to(params["pe"][None, :n, :], (coords.shape[0], n, dim))
    rel = coords[:, :, None, :] - coords[:, None, :, :]
    d2 = jnp.sum(rel * rel, axis=-1)           # squared distance edge feature
    for layer in params["layers"]:
        feats = _egnn_layer(layer, feats, d2, mask, block, dim)
    msum = jnp.sum(mask, axis=1, keepdims=True)
    return jnp.sum(feats * mask[..., None], axis=1) / jnp.maximum(msum, 1.0)


def embed(params: dict, coords: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Embed CA coordinate sets. coords [B,N,3] float32 (pad with zeros),
    mask [B,N] (1 = valid). Returns [B, 128] float32.

    Parity: FoldClassNet.forward (nndef_fold_egnn_embed.py:50-62) for an
    all-ones mask.
    """
    coords = jnp.asarray(coords, jnp.float32)
    if mask is None:
        mask = jnp.ones(coords.shape[:2], jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    return _embed_impl(params, coords, mask, _choose_block(coords.shape[1]))


# ---------------------------------------------------------------------------
# weight conversion from the reference torch checkpoint

def params_from_torch_state_dict(sd: dict) -> dict:
    """Convert a reference FoldClassNet state_dict (tensors or ndarrays) into
    the JAX params pytree. Torch Linear stores [out, in]; we store [in, out].

    Layout parity: FINAL_foldclass_model.pt keys
      posenc_as.pe, encode_ca_egnn.{0,1}.{edge_mlp.{0,2},edge_gate.0,node_mlp.{0,2}}.{weight,bias}
    """
    def arr(x):
        return np.asarray(getattr(x, "detach", lambda: x)().numpy() if hasattr(x, "numpy") else x,
                          dtype=np.float32)

    def lin(prefix):
        return {"w": jnp.asarray(arr(sd[prefix + ".weight"]).T),
                "b": jnp.asarray(arr(sd[prefix + ".bias"]))}

    layers = []
    for i in range(2):
        p = f"encode_ca_egnn.{i}"
        layers.append({
            "edge0": lin(p + ".edge_mlp.0"),
            "edge1": lin(p + ".edge_mlp.2"),
            "gate": lin(p + ".edge_gate.0"),
            "node0": lin(p + ".node_mlp.0"),
            "node1": lin(p + ".node_mlp.2"),
        })
    pe = arr(sd["posenc_as.pe"]) if "posenc_as.pe" in sd else sinusoidal_pe()
    pe = pe.reshape(-1, pe.shape[-1])
    return {"layers": layers, "pe": jnp.asarray(pe)}
