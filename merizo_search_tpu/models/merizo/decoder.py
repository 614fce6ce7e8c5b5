"""Mask-transformer decoder head in JAX.

Reimplements the behaviour of the reference MaskTransformer
(programs/Merizo/model/decoders/mask_decoder.py:91-214): 10 pre-norm blocks
over residue tokens concatenated with 20 learned class embeddings, ALiBi bias
zero-padded over the class tokens, cosine-style patch/class projection into
per-residue domain masks, a bi-GRU background head, and bi-GRU per-domain
confidence heads.

Split into two jitted stages with a host step between them, because the
reference inlines sequential cleanup heuristics (clean_domains /
clean_singletons, mask_decoder.py:191-195) in the middle of its forward:

  stage 1 `decoder_features`: transformer -> (domain_masks [B,N,20],
          bg_logits [B,N,2]) — all the FLOPs;
  host: argmax + cleanup + background masking (segment/postprocess.py);
  stage 2 `domain_confidence`: batched per-domain confidence GRUs over
          compacted domain slices — replaces the reference's Python loop over
          domains (mask_decoder.py:203-212) with one [n_dom, N, 20] batch.

Note the reference quirk kept here: attention logits are NOT scaled by
1/sqrt(head_dim) (mask_decoder.py:57).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .ipa import _lin, _ln, PRECISION
from ...ops.gru import bigru

N_CLS = 20
N_LAYERS = 10
N_HEADS_DEC = 16
D_MODEL = 512


def _block(p, x, bias, mask_1d):
    """One decoder block: x [B,T,D]; bias [B,H,T,T] or None; mask_1d [B,T]."""
    b, t, d = x.shape
    h = N_HEADS_DEC
    hd = d // h
    y = _ln(p["norm1"], x)
    qkv = _lin(p["qkv"], y).reshape(b, t, 3, h, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    a = jnp.einsum("bihd,bjhd->bhij", q, k, precision=PRECISION)  # no 1/sqrt(d) scale
    if bias is not None:
        a = a + bias
    a = a + 1e9 * (mask_1d[:, None, None, :] - 1.0)
    a = jax.nn.softmax(a, axis=-1)
    o = jnp.einsum("bhij,bjhd->bihd", a, v, precision=PRECISION).reshape(b, t, d)
    x = x + _lin(p["proj"], o)
    y = _ln(p["norm2"], x)
    y = _lin(p["fc2"], jax.nn.gelu(_lin(p["fc1"], y), approximate=False))
    return x + y


def decoder_features(p, s, bias, mask):
    """Transformer + projections.

    s [B,N,D] encoder output; bias [B,H,N,N] ALiBi (zero-padded over class
    tokens internally); mask [B,N] residue validity.

    Returns (domain_masks [B,N,N_CLS], bg_logits [B,N,2], features [B,N,D]).
    """
    b, n, d = s.shape
    cls = jnp.broadcast_to(p["cls_emb"], (b, N_CLS, d))
    x = jnp.concatenate([s, cls], axis=1)
    full_mask = jnp.concatenate([mask, jnp.ones((b, N_CLS), mask.dtype)], axis=1)
    if bias is not None:
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, N_CLS), (0, N_CLS)))
    for blk in p["blocks"]:
        x = _block(blk, x, bias, full_mask)
    x = _ln(p["decoder_norm"], x)

    features = x[:, :n] @ p["proj_patch"]
    classes = x[:, n:] @ p["proj_classes"]
    features = features / jnp.linalg.norm(features, axis=-1, keepdims=True)
    classes = classes / jnp.linalg.norm(classes, axis=-1, keepdims=True)
    domain_masks = _ln(p["class_norm"],
                       jnp.einsum("bnd,bcd->bnc", features, classes, precision=PRECISION))
    bg_out, _ = bigru(p["bg_gru"], features, mask)
    bg_logits = _lin(p["bg_out"], bg_out)
    return domain_masks, bg_logits, features


def domain_confidence(p, domain_masks, sel_idx, sel_mask):
    """Per-domain confidence, batched over domains.

    domain_masks [B=1,N,N_CLS] from decoder_features;
    sel_idx [K,N] int32 — for domain k, the residue indices of its members
      compacted to the front (arbitrary beyond sel_mask);
    sel_mask [K,N] — 1 for valid member slots.

    Returns conf [K] in [0,1]. Parity: mask_decoder.py:203-212 — conf_gru's
    top-layer reverse-direction final state -> Linear -> clamp.
    """
    dm = domain_masks[0]                       # [N, C]
    seqs = dm[sel_idx]                         # [K, N, C]
    _, h_last = bigru(p["conf_gru"], seqs, sel_mask)
    conf = _lin(p["conf_out"], h_last)[:, 0]
    return jnp.clip(conf, 0.0, 1.0)


def compact_domain_selection(dom_ids: np.ndarray, ids: np.ndarray, n_pad: int | None = None):
    """Host helper: build (sel_idx [K,Npad], sel_mask [K,Npad]) for
    domain_confidence from an id vector [N] and the unique ids to score."""
    n = len(dom_ids)
    n_pad = n_pad or n
    k = len(ids)
    sel_idx = np.zeros((k, n_pad), np.int32)
    sel_mask = np.zeros((k, n_pad), np.float32)
    for j, d in enumerate(ids):
        pos = np.nonzero(dom_ids == d)[0]
        sel_idx[j, :len(pos)] = pos
        sel_mask[j, :len(pos)] = 1.0
    return sel_idx, sel_mask
