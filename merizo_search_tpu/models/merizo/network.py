"""Merizo segmentation network: assembly, ALiBi, weight conversion, init.

Reference top model: programs/Merizo/model/network.py:9-53 — s/z input
projections, the IPA encoder, symmetric ALiBi bias
(programs/Merizo/model/posenc/alibi.py:7-39, clip 32), and the mask decoder.

The compute-heavy forward is `forward_features` (jitted per length bucket).
The sequential cleanup + per-domain confidence of the reference forward live
in segment/postprocess.py and decoder.domain_confidence (see decoder.py
docstring for the split rationale).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import ipa as ipa_mod
from . import decoder as dec_mod
from ...ops.gru import gru_params_from_torch, gru_params_init

N_CLASSES = 20


def alibi_slopes(heads: int = 16) -> np.ndarray:
    """Power-of-two ALiBi slope schedule (alibi.py:19-29)."""
    start = 2.0 ** (-(2.0 ** -(math.log2(heads) - 3)))
    return np.asarray([start ** (i + 1) for i in range(heads)], np.float32)


_SLOPES = jnp.asarray(alibi_slopes(16))


def alibi_bias(ri, clip: int = 32):
    """Symmetric ALiBi bias [B,H,N,N] from residue indices ri [B,N]
    (alibi.py:31-39; slope_factor=1, clip at 32 as used by network.py:50)."""
    rel = jnp.abs(ri[:, None, :] - ri[:, :, None])
    rel = jnp.clip(rel, max=clip)
    return -rel[:, None, :, :] * _SLOPES[None, :, None, None]


@partial(jax.jit, static_argnames=())
def forward_features(params, s, z, r, t, ri, mask):
    """Heavy forward: projections + IPA encoder + decoder transformer.

    s [B,N,20] one-hot, z [B,N,N,1] CA distance map, r [B,N,3,3], t [B,N,3],
    ri [B,N] residue indices, mask [B,N].

    Returns (domain_masks [B,N,20], bg_logits [B,N,2]).
    """
    s = s @ params["linear_s_in"]["w"]
    z = z @ params["linear_z_in"]["w"]
    enc = ipa_mod.ipa_encoder(params["ipa"], s, z, r, t, mask)
    bias = alibi_bias(ri)
    domain_masks, bg_logits, _ = dec_mod.decoder_features(params["decoder"], enc, bias, mask)
    return domain_masks, bg_logits


domain_confidence = jax.jit(dec_mod.domain_confidence)


# ---------------------------------------------------------------------------
# weight conversion / init

def _t(x):
    v = x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)
    return jnp.asarray(v, jnp.float32)


def params_from_torch_state_dict(sd: dict) -> dict:
    """Convert the reference Merizo state_dict (merged from the three split
    weight files, predict.py:117-140) into the JAX pytree."""
    def lin(prefix, bias=True):
        p = {"w": _t(sd[prefix + ".weight"]).T}
        if bias:
            p["b"] = _t(sd[prefix + ".bias"])
        return p

    def ln(prefix):
        return {"w": _t(sd[prefix + ".weight"]), "b": _t(sd[prefix + ".bias"])}

    ipa_p = {
        "q": lin("ipa.ipa.linear_q"),
        "kv": lin("ipa.ipa.linear_kv"),
        "q_pts": lin("ipa.ipa.linear_q_points"),
        "kv_pts": lin("ipa.ipa.linear_kv_points"),
        "b": lin("ipa.ipa.linear_b"),
        "head_weights": _t(sd["ipa.ipa.head_weights"]),
        "pair_out": lin("ipa.ipa.pair_out"),
        "hidden_out": lin("ipa.ipa.hidden_out"),
        "points_out": lin("ipa.ipa.points_out"),
        "points_norm_out": lin("ipa.ipa.points_norm_out"),
    }
    encoder = {
        "ln_s": ln("ipa.layer_norm_s"),
        "ln_z": ln("ipa.layer_norm_z"),
        "linear_in": lin("ipa.linear_in"),
        "ipa": ipa_p,
        "ln_ipa": ln("ipa.layer_norm_ipa"),
        "transition": {
            "gru": gru_params_from_torch(sd, "ipa.transition.layers.0", 2),
            "ln": ln("ipa.transition.layer_norm"),
        },
    }
    blocks = []
    for i in range(dec_mod.N_LAYERS):
        pre = f"decoder_head.blocks.{i}"
        blocks.append({
            "norm1": ln(pre + ".norm1"),
            "norm2": ln(pre + ".norm2"),
            "qkv": lin(pre + ".attn.qkv"),
            "proj": lin(pre + ".attn.proj"),
            "fc1": lin(pre + ".mlp.fc1"),
            "fc2": lin(pre + ".mlp.fc2"),
        })
    decoder = {
        "blocks": blocks,
        "cls_emb": _t(sd["decoder_head.cls_emb"])[0],
        "proj_patch": _t(sd["decoder_head.proj_patch"]),
        "proj_classes": _t(sd["decoder_head.proj_classes"]),
        "decoder_norm": ln("decoder_head.decoder_norm"),
        "class_norm": ln("decoder_head.class_norm"),
        "bg_gru": gru_params_from_torch(sd, "decoder_head.bg_gru", 2),
        "bg_out": lin("decoder_head.bg_out"),
        "conf_gru": gru_params_from_torch(sd, "decoder_head.conf_gru", 2),
        "conf_out": lin("decoder_head.conf_out"),
    }
    return {
        "linear_s_in": {"w": _t(sd["linear_s_in.weight"]).T},
        "linear_z_in": {"w": _t(sd["linear_z_in.weight"]).T},
        "ipa": encoder,
        "decoder": decoder,
    }


def init_params(key) -> dict:
    """Random init with the right shapes (for tests/benches; real runs load a
    converted checkpoint)."""
    c, h, cz = ipa_mod.C_S, ipa_mod.N_HEADS, ipa_mod.C_Z
    ch = ipa_mod.C_HIDDEN

    def lin(key, i, o, bias=True, scale=None):
        kw, _ = jax.random.split(key)
        s = scale if scale is not None else 1.0 / math.sqrt(i)
        p = {"w": jax.random.normal(kw, (i, o), jnp.float32) * s}
        if bias:
            p["b"] = jnp.zeros((o,), jnp.float32)
        return p

    def ln(dim):
        return {"w": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)}

    ks = list(jax.random.split(key, 64))

    def nk():
        return ks.pop()

    ipa_p = {
        "q": lin(nk(), c, h * ch),
        "kv": lin(nk(), c, 2 * h * ch),
        "q_pts": lin(nk(), c, h * ipa_mod.N_QK_POINTS * 3),
        "kv_pts": lin(nk(), c, h * (ipa_mod.N_QK_POINTS + ipa_mod.N_V_POINTS) * 3),
        "b": lin(nk(), cz, h),
        "head_weights": jnp.full((h,), 0.541324854612918, jnp.float32),
        "pair_out": lin(nk(), h * cz, c, scale=0.0),
        "hidden_out": lin(nk(), h * ch, c, scale=0.0),
        "points_out": lin(nk(), h * ipa_mod.N_V_POINTS * 3, c, scale=0.0),
        "points_norm_out": lin(nk(), h * ipa_mod.N_V_POINTS, c, scale=0.0),
    }
    encoder = {
        "ln_s": ln(c), "ln_z": ln(cz), "linear_in": lin(nk(), c, c),
        "ipa": ipa_p, "ln_ipa": ln(c),
        "transition": {"gru": gru_params_init(nk(), c, c // 2, 2), "ln": ln(c)},
    }
    blocks = []
    for _ in range(dec_mod.N_LAYERS):
        blocks.append({
            "norm1": ln(c), "norm2": ln(c),
            "qkv": lin(nk(), c, 3 * c), "proj": lin(nk(), c, c),
            "fc1": lin(nk(), c, c), "fc2": lin(nk(), c, c),
        })
    decoder = {
        "blocks": blocks,
        "cls_emb": jax.random.normal(nk(), (N_CLASSES, c), jnp.float32),
        "proj_patch": jax.random.normal(nk(), (c, c), jnp.float32) * c ** -0.5,
        "proj_classes": jax.random.normal(nk(), (c, c), jnp.float32) * c ** -0.5,
        "decoder_norm": ln(c), "class_norm": ln(N_CLASSES),
        "bg_gru": gru_params_init(nk(), c, c // 2, 2),
        "bg_out": lin(nk(), c, 2),
        "conf_gru": gru_params_init(nk(), N_CLASSES, c, 2),
        "conf_out": lin(nk(), c, 1),
    }
    return {
        "linear_s_in": {"w": jax.random.normal(nk(), (20, c), jnp.float32) * 0.05},
        "linear_z_in": {"w": jax.random.normal(nk(), (1, cz), jnp.float32) * 0.5},
        "ipa": encoder,
        "decoder": decoder,
    }


def load_merizo_params(weights_dir: str | None = None):
    """Load the reference's three-way-split weight files
    (predict.py:117-140) and convert; random init when unavailable."""
    if weights_dir:
        import os
        import torch

        sd = {}
        for f in sorted(os.listdir(weights_dir)):
            if f.endswith(".pt"):
                sd.update(torch.load(os.path.join(weights_dir, f), map_location="cpu"))
        if sd:
            return params_from_torch_state_dict(sd)
    # jit the init: eager init dispatches dozens of one-off device programs
    # (minutes through a remote-TPU tunnel); one compile builds the tree
    return jax.jit(init_params)(jax.random.PRNGKey(0))
