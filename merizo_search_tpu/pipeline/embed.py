"""Batched Foldclass embedding of variable-length structures.

The reference embeds one structure per forward pass (makedb.py:75-79,
dbsearch.py:97-98). Here structures are grouped into length buckets and run
as masked batches, keeping the MXU fed; each distinct bucket shape compiles
once and is cached.
"""

from __future__ import annotations

import logging

import numpy as np
import jax

from ..models import foldclass as fc
from ..utils.bucketing import bucket_for, pad_coords, group_by_bucket

logger = logging.getLogger(__name__)

MAX_RES = 2000  # reference truncation at db build (makedb.py:68-69)


def load_foldclass_params(weights_path: str | None = None):
    """Load converted reference weights, or deterministic random init when no
    checkpoint is available (the reference's trained FINAL_foldclass_model.pt
    is a stripped blob in this mirror)."""
    if weights_path:
        import torch

        sd = torch.load(weights_path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        return fc.params_from_torch_state_dict(sd)
    return jax.jit(fc.init_params)(jax.random.PRNGKey(0))


def _batch_budget(bucket: int) -> int:
    """Structures per batch for a given bucket length: bound total pair work
    (B * N^2) at ~8M pairs per dispatch."""
    return max(1, (1 << 23) // (bucket * bucket))


def embed_structures(params, coords_list: list[np.ndarray],
                     batch_budget=None, mesh=None) -> np.ndarray:
    """Embed a list of [N_i, 3] float32 CA coordinate arrays -> [n, 128].

    Structures longer than MAX_RES are truncated (parity: makedb.py:68).
    With a mesh, each length-bucket batch is sharded on the batch axis so
    every device embeds 1/ndev of the structures (data parallel; XLA inserts
    no collectives until the gather of the final [B,128] embeddings).
    """
    ndev = 1
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        ndev = int(np.prod(list(mesh.shape.values())))
        sh3 = NamedSharding(mesh, P(axis, None, None))
        sh2 = NamedSharding(mesh, P(axis, None))

    n = len(coords_list)
    out = np.zeros((n, fc.EMBED_DIM), dtype=np.float32)
    lengths = [min(len(c), MAX_RES) for c in coords_list]
    groups = group_by_bucket(lengths)

    # Small query sets (the easy-search path: a handful of domains spanning
    # 2-4 length buckets) are dispatch-overhead-bound, not compute-bound —
    # one [n, maxbucket] batch costs ~1 device call while per-bucket batches
    # cost one call each. Collapse the buckets whenever the padded pair work
    # still fits a single dispatch budget; big sweeps (createdb) keep exact
    # bucketing, where the N^2 padding blowup would dominate.
    if len(groups) > 1:
        maxb = max(groups)
        if n * maxb * maxb <= (1 << 23):
            groups = {maxb: sorted(i for idxs in groups.values()
                                   for i in idxs)}

    # Dispatch-then-sync: jax dispatch is async, so issuing every bucket
    # batch before the first np.asarray sync overlaps the device round
    # trips (queries usually span 2-4 length buckets, and on a tunneled
    # chip each serial sync pays the full RTT). In-flight depth is bounded
    # so a huge createdb sweep doesn't pin every batch in memory at once.
    max_inflight = 4
    pending: list[tuple[list[int], object]] = []

    def _drain(limit: int):
        while len(pending) > limit:
            sel_d, fut = pending.pop(0)
            emb = np.asarray(fut)
            for bi, si in enumerate(sel_d):
                out[si] = emb[bi]

    for bucket, idxs in sorted(groups.items()):
        bsz = batch_budget(bucket) if batch_budget else _batch_budget(bucket) * ndev
        bsz = ((bsz + ndev - 1) // ndev) * ndev
        for i0 in range(0, len(idxs), bsz):
            sel = idxs[i0:i0 + bsz]
            # pad the batch to a power of two (and an even device split) so
            # each bucket compiles O(log bsz) shapes — remainder batches and
            # varying per-query domain counts would otherwise each compile
            # a fresh (B, bucket) shape (padding rows carry a zero mask)
            bpad = 1
            while bpad < len(sel):
                bpad *= 2
            bpad = ((bpad + ndev - 1) // ndev) * ndev
            batch = np.zeros((bpad, bucket, 3), np.float32)
            mask = np.zeros((bpad, bucket), np.float32)
            for bi, si in enumerate(sel):
                c, m = pad_coords(coords_list[si][:MAX_RES], bucket)
                batch[bi], mask[bi] = c, m
            if mesh is not None:
                batch = jax.device_put(batch, sh3)
                mask = jax.device_put(mask, sh2)
            pending.append((sel, fc.embed(params, batch, mask)))
            _drain(max_inflight - 1)
    _drain(0)
    return out
