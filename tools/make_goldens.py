"""Generate numerical-parity golden files by running the *reference* torch
models (from /root/reference, read-only) with seeded random weights.

The goldens (tests/golden/*.npz) contain: the torch state_dict arrays, the
inputs, and the reference outputs. Tests then check the JAX reimplementation
against them without importing the reference at test time.

Run: python tools/make_goldens.py [--only foldclass|merizo]

Note: the reference's real trained weights are stripped from the mirror
(/root/reference/.MISSING_LARGE_BLOBS), so goldens use random weights — they
pin down architecture parity, which is what transfers to the real checkpoints
via the weight converters.
"""

import argparse
import os
import sys

import numpy as np
import torch

REF = "/root/reference/merizo_search"
sys.path.insert(0, REF)
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")


def sd_to_npz(sd, prefix=""):
    return {prefix + k: v.detach().cpu().numpy() for k, v in sd.items()}


def install_rotary_stub():
    """Make `rotary_embedding_torch` importable; return its RotaryEmbedding.

    The real lucidrains package is not installed in this image, so goldens are
    generated against this faithful stand-in for the default path the
    reference exercises (`RotaryEmbedding(dim).rotate_queries_or_keys(t)`,
    nndef_ipa.py:111,184-185): theta=10000, positions along dim -2,
    interleaved pair rotation over the first `dim` channels, remaining
    channels passed through. If the real package is present it wins.

    The convention is pinned by tests/test_rotary_convention.py, which checks
    this class against an independently-derived complex-arithmetic
    formulation and discriminates it from the half-split (GPT-NeoX) variant.
    """
    try:
        from rotary_embedding_torch import RotaryEmbedding  # noqa: F401
        return RotaryEmbedding
    except ImportError:
        pass
    import types

    mod = types.ModuleType("rotary_embedding_torch")

    class RotaryEmbedding(torch.nn.Module):
        def __init__(self, dim, theta=10000):
            super().__init__()
            inv = 1.0 / (theta ** (torch.arange(0, dim, 2).float() / dim))
            self.register_buffer("inv_freq", inv)

        def rotate_queries_or_keys(self, t, seq_dim=-2):
            seq_len = t.shape[seq_dim]
            pos = torch.arange(seq_len, dtype=self.inv_freq.dtype)
            freqs = torch.einsum("i,j->ij", pos, self.inv_freq)     # [S, dim/2]
            freqs = torch.repeat_interleave(freqs, 2, dim=-1)        # [S, dim]
            rot_dim = freqs.shape[-1]
            # broadcast freqs over leading dims at position seq_dim
            shape = [1] * t.ndim
            shape[seq_dim] = seq_len
            shape[-1] = rot_dim
            freqs = freqs.reshape(shape)
            t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
            x1 = t_rot[..., 0::2]
            x2 = t_rot[..., 1::2]
            half_rot = torch.stack((-x2, x1), dim=-1).reshape(t_rot.shape)
            t_rot = t_rot * freqs.cos() + half_rot * freqs.sin()
            return torch.cat((t_rot, t_pass), dim=-1)

    mod.RotaryEmbedding = RotaryEmbedding
    sys.modules["rotary_embedding_torch"] = mod
    return RotaryEmbedding


def make_foldclass():
    from programs.Foldclass.nndef_fold_egnn_embed import FoldClassNet

    torch.manual_seed(0)
    net = FoldClassNet(128).eval()
    rng = np.random.default_rng(42)
    out = {}
    cases = {}
    for name, n in [("small", 37), ("mid", 100), ("large", 256)]:
        coords = (rng.normal(size=(n, 3)) * 8.0).astype(np.float32)
        with torch.no_grad():
            emb = net(torch.from_numpy(coords).unsqueeze(0)).numpy()
        cases[f"coords_{name}"] = coords
        cases[f"emb_{name}"] = emb
    out.update(sd_to_npz(net.state_dict(), "sd."))
    out.update(cases)
    np.savez_compressed(os.path.join(OUT, "foldclass.npz"), **out)
    print("wrote foldclass.npz:", {k: v.shape for k, v in cases.items()})


def make_merizo():
    # natsort is not installed in this image; the reference imports it at
    # module scope. Provide a faithful stand-in (natural sort).
    try:
        import natsort  # noqa: F401
    except ImportError:
        import re
        import types

        mod = types.ModuleType("natsort")
        mod.natsorted = lambda xs: sorted(
            xs, key=lambda s: [int(p) if p.isdigit() else p for p in re.split(r"(\d+)", s)])
        sys.modules["natsort"] = mod
    try:
        import matplotlib
        matplotlib.use("Agg")
    except ImportError:
        pass

    # Make rotary_embedding_torch importable (stub if absent; see
    # install_rotary_stub's docstring for the convention pinning).
    install_rotary_stub()

    from programs.Merizo.model.network import Merizo
    from programs.Merizo.model.utils.features import generate_features_domain

    torch.manual_seed(0)
    net = Merizo().eval()
    # Use a real example structure for realistic geometry.
    pdb = "/root/reference/examples/AF-Q96HM7-F1-model_v4.pdb"
    feats = generate_features_domain(pdb, torch.device("cpu"))

    with torch.no_grad():
        s_in = net.linear_s_in(feats["s"])
        z_in = net.linear_z_in(feats["z"])
        from programs.Merizo.model.ipa.nndef_ipa_primitives import Rigid, Rotation
        ipa_out, _ = net.ipa(s=s_in, z=z_in, rigids=Rigid(Rotation(feats["r"]), feats["t"]))
        bias = net.alibi(feats["ri"].squeeze(0), clip=True)
        dom_ids, conf_res = net.decoder_head(ipa_out, bias=bias)

    out = sd_to_npz(net.state_dict(), "sd.")
    out.update({
        "s": feats["s"].numpy(), "z": feats["z"].numpy(), "r": feats["r"].numpy(),
        "t": feats["t"].numpy(), "ri": feats["ri"].numpy(),
        "ipa_out": ipa_out.numpy(), "alibi_bias": bias.numpy(),
        "dom_ids": dom_ids.numpy(), "conf_res": conf_res.numpy(),
    })
    np.savez_compressed(os.path.join(OUT, "merizo.npz"), **out)
    print("wrote merizo.npz: nres =", feats["s"].shape[1],
          "ndom_ids =", len(np.unique(dom_ids.numpy())))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["foldclass", "merizo"], default=None)
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)
    if args.only in (None, "foldclass"):
        make_foldclass()
    if args.only in (None, "merizo"):
        make_merizo()
