"""Segmentation pipeline: the run_merizo equivalent.

Reference flow (programs/Merizo/predict.py:142-197,34-114): feature gen ->
network forward -> in-forward cleanups -> optional iterative re-segmentation
of oversized domains -> graph component separation -> size cleanups ->
renumbering.

TPU design: the network forward is jitted per length bucket (static shapes);
every sequential heuristic runs on the host between jit calls. Iterative mode
re-runs the same bucketed forward on residue subsets, so no recompilation
happens beyond the bucket set.
"""

from __future__ import annotations

import logging
import time

import numpy as np
import jax.numpy as jnp

from ..models.merizo import network as mznet
from ..models.merizo.features import generate_features
from ..models.merizo import decoder as dec_mod
from ..utils.bucketing import bucket_for
from . import postprocess as pp

logger = logging.getLogger(__name__)

N_CLASSES = 20


def _forward_subset(params, f: dict, sel: np.ndarray | None = None):
    """Run the network on (a subset of) the features, with bucket padding.

    Mirrors the reference's mask-cropped forward (network.py:35-40) plus the
    decoder tail (mask_decoder.py:186-214). Returns (dom_ids [n], conf [n])
    for the selected residues.
    """
    if sel is None:
        sel = np.arange(f["nres"])
    n = len(sel)
    bucket = bucket_for(n)

    s = np.zeros((1, bucket, 20), np.float32)
    z = np.zeros((1, bucket, bucket, 1), np.float32)
    r = np.zeros((1, bucket, 3, 3), np.float32)
    r[:, :, 0, 0] = r[:, :, 1, 1] = r[:, :, 2, 2] = 1.0
    t = np.zeros((1, bucket, 3), np.float32)
    ri = np.zeros((1, bucket), np.float32)
    mask = np.zeros((1, bucket), np.float32)

    s[0, :n] = f["s"][sel]
    z[0, :n, :n, 0] = f["z"][np.ix_(sel, sel)]
    r[0, :n] = f["r"][sel]
    t[0, :n] = f["t"][sel]
    ri[0, :n] = f["ri"][sel]
    mask[0, :n] = 1.0

    dm, bg = mznet.forward_features(params, jnp.asarray(s), jnp.asarray(z),
                                    jnp.asarray(r), jnp.asarray(t),
                                    jnp.asarray(ri), jnp.asarray(mask))
    dm = np.asarray(dm)
    bg = np.asarray(bg)

    pred = dm[0, :n].argmax(-1).astype(np.int64)
    # in-decoder cleanups with the reference's hardcoded thresholds
    pred = pp.clean_domains(pred, 50)
    pred = pp.clean_singletons(pred, 10)
    dom_ids = pred * bg[0, :n].argmax(-1)

    conf = np.zeros(n, np.float32)
    ids, k = pp.get_ids(dom_ids)
    if k:
        k_pad = -(-k // 4) * 4  # pad domain batch to limit recompiles
        sel_idx, sel_mask = dec_mod.compact_domain_selection(dom_ids, ids, n_pad=bucket)
        if k_pad != k:
            sel_idx = np.concatenate([sel_idx, np.zeros((k_pad - k, bucket), np.int32)])
            sel_mask = np.concatenate([sel_mask, np.zeros((k_pad - k, bucket), np.float32)])
            sel_mask[k:, 0] = 1.0  # avoid empty sequences in the pad rows
        c = np.asarray(mznet.domain_confidence(params["decoder"], jnp.asarray(dm),
                                               jnp.asarray(sel_idx), jnp.asarray(sel_mask)))
        for j, d in enumerate(ids):
            conf[dom_ids == d] = c[j]
    return dom_ids, conf


def _iterative_segmentation(params, f, dom_ids, conf_res, max_iterations: int,
                            domain_ave_size: int):
    """Re-segment oversized domains (parity: predict.py:34-114)."""
    ignore: set[int] = set()
    for _ in range(max_iterations):
        candidates = {}
        for d in pp.get_ids(dom_ids)[0]:
            d = int(d)
            if d in ignore:
                continue
            n_d = int((dom_ids == d).sum())
            if n_d > domain_ave_size:
                candidates[d] = n_d
            else:
                ignore.add(d)
        if not candidates:
            break
        counter = 1
        for d in candidates:
            sel = np.nonzero(dom_ids == d)[0]
            sub_ids, sub_conf = _forward_subset(params, f, sel)
            ids_, ndoms_ = pp.get_ids(sub_ids)
            if ndoms_ <= 1:
                ignore.add(d)
            else:
                dd = sub_ids + counter * N_CLASSES
                dd[sub_ids == 0] = 0
                dom_ids[sel] = dd
                conf_res[sel] = sub_conf
                counter += 1
    return dom_ids, conf_res


def segment_structure(params, path: str, chain: str = "A", iterate: bool = False,
                      length_conditional_iterate: bool = False,
                      max_iterations: int = 3, min_domain_size: int = 50,
                      min_fragment_size: int = 10, domain_ave_size: int = 200,
                      conf_threshold: float = 0.5, shuffle_indices: bool = False) -> dict:
    """Segment one structure. Returns the feature dict extended with
    domain_ids, conf_res, conf_global, ndom, domain_map (parity:
    predict.py:142-197)."""
    t0 = time.time()
    f = generate_features(path, chain)

    if length_conditional_iterate and f["nres"] > 512:
        iterate = True

    dom_ids, conf_res = _forward_subset(params, f)

    if iterate and f["nres"] > domain_ave_size * 2:
        dom_ids, conf_res = _iterative_segmentation(
            params, f, dom_ids, conf_res, max_iterations, domain_ave_size)

    domain_map = pp.instance_matrix(dom_ids)
    dom_ids = pp.separate_components(domain_map, f["z"], dom_ids)

    if len(np.unique(dom_ids)) > 1:
        dom_ids = pp.clean_domains(dom_ids, min_domain_size)
        dom_ids = pp.clean_singletons(dom_ids, min_fragment_size)

    f["domain_map"] = pp.instance_matrix(dom_ids)
    f["conf_res"] = conf_res
    f["conf_global"] = float(conf_res.mean()) if len(conf_res) else 0.0
    f["ndom"] = pp.get_ids(dom_ids)[1]
    f["domain_ids"] = (pp.shuffle_ids(dom_ids) if shuffle_indices
                       else pp.remap_ids(dom_ids))
    f["runtime"] = time.time() - t0
    return f
