"""The search engine: exact cosine top-k over Foldclass databases.

Three execution modes over the same `ops.topk` scan core:

- "device": whole DB resident in one device's HBM (CATH-scale, <= a few GB).
- "mesh":   DB rows sharded over a `jax.sharding.Mesh` axis 'd' via shard_map;
            each chip scans its shard with the MXU and the per-shard top-k
            candidates are merged with an all-gather over ICI. This replaces
            the reference's faiss `index_cpu_to_all_gpus` replication
            (dbsearch.py:228-230) with true HBM sharding: an N-row DB needs
            N/ndev rows of HBM per chip.
- "stream": larger-than-HBM DBs scanned in host-RAM blocks (np.memmap) that
            are staged to the device asynchronously and merged, replacing the
            reference's faiss ResultHeap block loop (dbsearch.py:232-248).
            With a mesh, each staged superblock is itself sharded, so the
            aggregate HBM of the mesh sets the block size.
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

def _shard_map_unchecked(f, **kw):
    """shard_map with replication/varying-axis checking off, across jax versions
    (check_vma in >=0.8, check_rep before)."""
    try:
        return shard_map(f, check_vma=False, **kw)
    except TypeError:  # pragma: no cover - older jax
        return shard_map(f, check_rep=False, **kw)


from ..db.codecs import FlatDB
from ..ops import topk as topk_ops
from ..ops import pallas_scan

logger = logging.getLogger(__name__)


def _np_dedup_topk(pv: np.ndarray, pi: np.ndarray, k: int):
    """Host-side top-k by score among unique ids (stream-IVF merge).

    pv [Q, M] f32, pi [Q, M] i32 original row ids (-1 invalid). Keeps the
    highest-scored copy of each id (duplicates from multi-assigned IVF
    layouts score identically). M is a few hundred, Q a few hundred — the
    per-row numpy pass is microseconds."""
    qn = pv.shape[0]
    order = np.argsort(-pv, axis=1, kind="stable")
    sv = np.take_along_axis(pv, order, 1)
    si = np.take_along_axis(pi, order, 1)
    out_v = np.full((qn, k), -np.inf, np.float32)
    out_i = np.full((qn, k), -1, np.int32)
    for r in range(qn):
        _, first = np.unique(si[r], return_index=True)
        keep = np.zeros(si.shape[1], bool)
        keep[first] = True
        keep &= si[r] >= 0
        vv, ii = sv[r][keep], si[r][keep]
        m = min(k, len(vv))
        out_v[r, :m] = vv[:m]
        out_i[r, :m] = ii[:m]
    return out_v, out_i


def _normalize_rows(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    return (x / np.maximum(n, 1e-12)).astype(x.dtype)


def _ordered_prefetch(items, fn, threads: int | None = None):
    """Yield fn(item) for each item IN ORDER, prepared by a thread pool.

    The streaming scans' host staging (memmap read + quantise + pad) is
    memcpy-dominated and releases the GIL, but a single producer thread
    tops out at one core's copy bandwidth (~3 GB/s) — below NVMe/page-cache
    rates. A small pool prepares the next few blocks concurrently while the
    consumer scans the current one; the submit window (threads + 1) bounds
    host RAM to a handful of blocks in flight.

    Exceptions from fn propagate to the consumer at that item's turn. If the
    consumer raises (device OOM, bad input) mid-iteration, the generator's
    close cancels all queued work — running calls finish and are dropped, so
    no thread or staged buffer outlives the search by more than one block.
    """
    import os as _os
    from concurrent.futures import ThreadPoolExecutor
    from collections import deque

    if threads is None:
        threads = max(1, int(_os.environ.get("MERIZO_STAGE_THREADS", "3")))
    ex = ThreadPoolExecutor(max_workers=threads)
    try:
        futs: deque = deque()
        it = iter(items)
        for item in it:
            futs.append(ex.submit(fn, item))
            if len(futs) > threads:
                break
        while futs:
            out = futs.popleft().result()
            nxt = next(it, None)
            if nxt is not None:
                futs.append(ex.submit(fn, nxt))
            yield out
    finally:
        ex.shutdown(wait=False, cancel_futures=True)


def build_mesh_search(mesh: Mesh, k: int, chunk: int, mincov: float, use_lengths: bool,
                      selection: str = "exact", recall_target: float = 0.95,
                      fused: bool = False, fused_tile: int | None = None,
                      interpret: bool = False, quantized: bool = False):
    """Build a jitted, shard_map'd search fn for a given mesh/k/chunk.

    fused=True runs the Pallas fused scan on each chip's shard (TPU bf16
    shards whose row count divides the tile); otherwise the XLA scan.
    quantized=True takes int8 shards plus per-row scales (sharded alongside
    the rows) through the fused int8 path; query dequantisation is the
    caller's job (scores scale per query, so per-shard ranking is unchanged).
    """
    axis = mesh.axis_names[0]
    tile = fused_tile or pallas_scan.DEFAULT_TILE

    def local_fn(q, db_shard, tlen_shard, n_valid, qlen, scale_shard):
        nd = jax.lax.axis_size(axis)
        me = jax.lax.axis_index(axis)
        shard_rows = db_shard.shape[0]
        local_valid = jnp.clip(n_valid[0] - me * shard_rows, 0, shard_rows)
        if fused:
            vals, idxs = pallas_scan.fused_topk(
                q, db_shard, local_valid, k,
                tlen=tlen_shard, qlen=qlen, mincov=mincov, tile=tile,
                use_len=use_lengths, interpret=interpret,
                scales=scale_shard if quantized else None)
        else:
            vals, idxs = topk_ops.topk_scan(
                q, db_shard, local_valid, k, chunk,
                tlen=tlen_shard if use_lengths else None,
                qlen=qlen if use_lengths else None, mincov=mincov,
                selection=selection, recall_target=recall_target)
        idxs = jnp.where(idxs >= 0, idxs + me * shard_rows, idxs)
        # gather per-shard candidates over ICI and merge (replicated result)
        av = jax.lax.all_gather(vals, axis)          # [nd, Q, k]
        ai = jax.lax.all_gather(idxs, axis)
        return topk_ops.merge_partials(av, ai, k)

    fn = _shard_map_unchecked(
        local_fn, mesh=mesh,
        in_specs=(P(None, None), P(axis, None), P(axis), P(None), P(None),
                  P(axis)),
        out_specs=(P(None, None), P(None, None)),
    )
    return jax.jit(fn)


class SearchEngine:
    """Exact top-k search over a FlatDB.

    Parameters
    ----------
    db : FlatDB
    mesh : optional jax.sharding.Mesh with a single axis; if given, the DB is
        sharded over it.
    chunk : scan chunk (rows per MXU matmul step).
    dtype : storage dtype on device (jnp.bfloat16 halves HBM traffic; scores
        always accumulate in float32).
    max_device_gb : HBM budget; DBs larger than this use streaming mode.
    """

    def __init__(self, db: FlatDB, mesh: Mesh | None = None, chunk: int = 2 ** 20,
                 dtype=jnp.float32, max_device_gb: float = 8.0,
                 stream_block: int = 2 ** 21, selection: str = "exact",
                 recall_target: float = 0.95, index: str = "flat",
                 ivf_nlist: int = 0, ivf_nprobe: int = 32,
                 ivf_rerank: bool = False):
        self.db = db
        self.mesh = mesh
        self.dtype = dtype
        self.stream_block = stream_block
        self.selection = selection
        self.recall_target = recall_target
        ndev = 1 if mesh is None else int(np.prod(list(mesh.shape.values())))
        self.ndev = ndev
        itemsize = {jnp.float32: 4, jnp.bfloat16: 2, jnp.int8: 1}.get(dtype, 4)
        db_bytes = db.size * db.dim * itemsize
        budget = max_device_gb * (1 << 30) * ndev
        self.mode = "device" if db_bytes <= budget else "stream"
        self.chunk = min(chunk, 1 << 20)
        self._resident = None
        self._mesh_fns = {}
        # lazy residency / sidecar builds can be hit concurrently by server
        # handler threads; double-checked locking keeps the first request
        # from racing a concurrent builder (e.g. two write_disk_ivf runs
        # corrupting the same sidecar files)
        import threading
        self._init_lock = threading.Lock()
        # fused Pallas scan: the production path for bf16/int8 DBs resident in
        # TPU HBM (single chip or mesh-sharded — each chip scans its own
        # shard). "auto" falls back to the XLA scan off-TPU and for DBs too
        # small to amortise the tile padding.
        self.quantized = dtype == jnp.int8
        self._fused = (
            selection in ("exact", "fused")
            and (dtype == jnp.bfloat16 or self.quantized)
            and db.size >= ndev * pallas_scan.DEFAULT_TILE
            and jax.default_backend() == "tpu")
        # IVF: sublinear probe for latency-sensitive serving (device mode;
        # single chip or mesh-sharded clusters).
        self.index = index
        self.ivf_nprobe = ivf_nprobe
        # exact f32 re-rank sidecar for IVF (see ivf._rerank_blocks):
        # +4 bytes/dim/row of device memory, removes the storage-dtype
        # ranking noise that caps recall (~0.98 bf16 / ~0.95 int8)
        self.ivf_rerank = ivf_rerank
        self._dhi = None
        self._ivf = None
        self._sivf = None
        if index == "ivf":
            # default nlist ~ sqrt(N), power of two, >= 16 (and a multiple of
            # the mesh size so shard boundaries fall on cluster boundaries)
            self.ivf_nlist = ivf_nlist or max(16, 1 << int(
                np.ceil(np.log2(max(np.sqrt(db.size), 16)))))
            if self.ivf_nlist % ndev:
                self.ivf_nlist = -(-self.ivf_nlist // ndev) * ndev
            # larger-than-HBM: disk-streaming IVF (cluster-contiguous
            # sidecar, probed clusters staged per batch — _stream_ivf_search)
        elif index != "flat":
            raise ValueError(f"unknown index type: {index}")

    # -- residency ----------------------------------------------------------
    def _load_resident(self):
        if self._resident is not None:
            return
        with self._init_lock:
            if self._resident is not None:
                return
            self._load_resident_locked()

    def _load_resident_locked(self):
        t0 = time.time()
        if self.index == "ivf":
            # k-means trains on a sample and scores in chunks, so a memmap
            # (mmap layout, already normalised) is used as-is; only raw pt
            # DBs (small) are materialised for normalisation
            emb = self._normalised_embeddings()
            lengths = self.db.lengths().astype(np.float32)
            from . import ivf as ivf_mod

            # persist the build next to the DB: centroids + permutation are
            # deterministic per (db, nlist) and building costs more than one
            # flat scan, so one-shot CLI runs and server restarts reuse it
            cache = None
            prefix = getattr(self.db, "prefix", None)
            if prefix:
                cache = f"{prefix}.ivf{self.ivf_nlist}.npz"
            fp = self._db_fingerprint()
            ivf = None
            if cache and os.path.exists(cache):
                z = np.load(cache)
                # staleness check: a rebuilt/extended DB under the same
                # prefix must invalidate the cached permutation, otherwise
                # appended rows are silently never searched (and reordered
                # rebuilds return wrong row ids). Old caches without a
                # fingerprint are treated as stale.
                if "fingerprint" in z and np.array_equal(z["fingerprint"], fp):
                    ivf = {"centroids": z["centroids"], "perm": z["perm"],
                           "cluster_rows": int(z["cluster_rows"]),
                           "nlist": int(z["centroids"].shape[0]),
                           # pre-multi-assignment caches hold duplicate-free
                           # layouts: dedup stays off for them
                           "dup": bool(z["dup"]) if "dup" in z else False}
                    logger.info("IVF loaded from %s", cache)
                else:
                    logger.warning("IVF cache %s is stale (database changed "
                                   "since the build); rebuilding", cache)
            if ivf is None:
                ivf = ivf_mod.build_ivf(emb, self.ivf_nlist,
                                        multiple_of=self.ndev)
                if cache:
                    try:
                        np.savez(cache, centroids=ivf["centroids"],
                                 perm=ivf["perm"],
                                 cluster_rows=ivf["cluster_rows"],
                                 dup=ivf["dup"], fingerprint=fp)
                    except OSError as e:
                        logger.warning("could not cache IVF build: %s", e)
            if self.mesh is not None and ivf["nlist"] % self.ndev:
                # a cached build from a different mesh size: rebuild so shard
                # boundaries fall on cluster boundaries
                ivf = ivf_mod.build_ivf(emb, self.ivf_nlist,
                                        multiple_of=self.ndev)
            perm = ivf["perm"]
            npad = len(perm)
            lp = np.full(npad, 1e9, np.float32)
            lp[perm >= 0] = lengths[perm[perm >= 0]]
            # permuted shards are materialised per device callback (one slab
            # of host RAM each, fancy-indexed straight off the memmap) — the
            # old full-DB permuted host copy scaled with the whole mesh's HBM
            ivf_tgt = (np.int8 if self.quantized else
                       np.dtype("bfloat16") if self.dtype == jnp.bfloat16
                       else np.float32)
            scale_cache: dict[int, np.ndarray] = {}

            def ivf_shard(idx):
                lo, hi, _ = idx[0].indices(npad)
                slab = ivf_mod.permute_rows(emb, perm[lo:hi], np.float32)
                if self.quantized:
                    qv, s = pallas_scan.quantize_blocks(slab)
                    scale_cache[lo] = s
                    return qv
                return slab.astype(ivf_tgt)

            if self.mesh is not None:
                axis = self.mesh.axis_names[0]
                row_sh = NamedSharding(self.mesh, P(axis, None))
                one_sh = NamedSharding(self.mesh, P(axis))
                cent_put = jax.device_put(ivf["centroids"])
                perm_put = jax.device_put(perm, one_sh)
            else:
                dev = jax.devices()[0]
                row_sh = jax.sharding.SingleDeviceSharding(dev)
                one_sh = row_sh
                cent_put = jax.device_put(ivf["centroids"])
                perm_put = jax.device_put(perm)
            self._demb = jax.make_array_from_callback(
                (npad, self.db.dim), row_sh, ivf_shard)
            self._dscale = None
            if self.quantized:
                self._dscale = jax.make_array_from_callback(
                    (npad,), one_sh,
                    lambda idx: scale_cache[idx[0].indices(npad)[0]])
            if self.ivf_rerank:
                self._dhi = jax.make_array_from_callback(
                    (npad, self.db.dim), row_sh,
                    lambda idx: ivf_mod.permute_rows(
                        emb, perm[idx[0].indices(npad)[0]:
                                  idx[0].indices(npad)[1]], np.float32))
            self._dlen = (jax.device_put(lp, one_sh) if self.mesh is not None
                          else jax.device_put(lp))
            self._ivf = {"centroids": cent_put, "perm": perm_put,
                         "dup": bool(ivf.get("dup", False))}
            self.ivf_nlist = int(ivf["centroids"].shape[0])  # build may clamp
            self._n_valid = self.db.size
            self._chunk_eff = self.chunk
            self._resident = True
            logger.info("IVF DB resident: %d rows in %d clusters (%.2f GB, %.2fs)",
                        self.db.size, ivf["nlist"],
                        self._demb.nbytes / 2 ** 30, time.time() - t0)
            return
        # pad rows so both the mesh split and the scan chunking divide evenly;
        # keep the chunk no bigger than one shard's worth of a small DB
        n = self.db.size
        dim = self.db.dim
        self._chunk_eff = max(8, min(self.chunk, ((n // self.ndev) + 7) // 8 * 8))
        if self.quantized and self.db.has_quant("int8"):
            # int8 sidecar reads must start on 128-row scale-block
            # boundaries; shard starts are multiples of chunk_eff
            self._chunk_eff = max(
                pallas_scan.BLOCK,
                -(-self._chunk_eff // pallas_scan.BLOCK) * pallas_scan.BLOCK)
        mult = self.ndev * self._chunk_eff
        if self._fused:
            mult = self.ndev * pallas_scan.DEFAULT_TILE
        npad = ((n + mult - 1) // mult) * mult
        # Each device shard is produced by a callback that streams bounded
        # f32 chunks from the DB (memmap for the mmap layout) straight into
        # a target-dtype buffer — peak host RAM is one shard in the storage
        # dtype plus one staging chunk, never the whole DB in f32 (a mesh-
        # resident 64 GB bf16 DB previously cost ~256 GB of host f32 copies).
        # Quantised sidecars (db.codecs.write_quantized_sidecar) are read
        # natively, skipping the fp32 decode entirely.
        CH = 1 << 18  # staging chunk: 128 MB of f32 rows at dim=128
        quant_fused = self.quantized and self._fused
        use_i8_side = self.quantized and self.db.has_quant("int8")
        use_bf_side = (self.dtype == jnp.bfloat16 and not self.quantized
                       and self.db.has_quant("bf16"))
        if quant_fused:
            tgt = np.int8
        elif self.dtype == jnp.bfloat16:
            tgt = np.dtype("bfloat16")
        else:
            # f32, and int8-requested off-TPU (tests): dequantised-equivalent
            # f32 keeps the int8 plumbing end-to-end testable anywhere
            tgt = np.float32
        scale_cache: dict[int, np.ndarray] = {}

        def shard_rows(idx):
            lo, hi, _ = idx[0].indices(npad)
            out = np.zeros((hi - lo, dim), tgt)
            sc = np.ones((hi - lo,), np.float32) if quant_fused else None
            for c0 in range(lo, min(hi, n), CH):
                c1 = min(c0 + CH, hi, n)
                o0, o1 = c0 - lo, c1 - lo
                if use_i8_side:
                    qv, s = self.db.read_rows_quant(c0, c1, "int8")
                    if quant_fused:
                        out[o0:o1] = qv
                        sc[o0:o1] = s
                    else:  # off-TPU: dequantised-equivalent f32 from sidecar
                        out[o0:o1] = qv.astype(np.float32) * s[:, None]
                elif use_bf_side:
                    out[o0:o1] = self.db.read_rows_quant(c0, c1, "bf16")
                elif quant_fused:
                    qv, s = pallas_scan.quantize_blocks(self.db.read_rows(c0, c1))
                    out[o0:o1] = qv
                    sc[o0:o1] = s
                elif self.quantized:
                    qv, s = pallas_scan.quantize_blocks(self.db.read_rows(c0, c1))
                    out[o0:o1] = qv.astype(np.float32) * s[:, None]
                else:
                    out[o0:o1] = self.db.read_rows(c0, c1).astype(tgt)
            if quant_fused:
                # keep scales uniform across the block straddling n: padding
                # rows are zeros, so they can carry the tail block's scale
                # (the fused kernel dequantises per 128-row block)
                b = pallas_scan.BLOCK
                if lo < n < hi and n % b:
                    t0_, t1_ = n - lo, min((n // b + 1) * b, hi) - lo
                    sc[t0_:t1_] = sc[t0_ - 1]
                scale_cache[lo] = sc
            return out

        if self.mesh is not None:
            axis = self.mesh.axis_names[0]
            sh = NamedSharding(self.mesh, P(axis, None))
            sh1 = NamedSharding(self.mesh, P(axis))
        else:
            dev = jax.devices()[0]
            sh = jax.sharding.SingleDeviceSharding(dev)
            sh1 = sh
        self._demb = jax.make_array_from_callback((npad, dim), sh, shard_rows)
        self._dscale = None
        if quant_fused:
            self._dscale = jax.make_array_from_callback(
                (npad,), sh1, lambda idx: scale_cache[idx[0].indices(npad)[0]])
        lengths = self.db.lengths().astype(np.float32)
        if npad != n:
            lengths = np.concatenate(
                [lengths, np.full(npad - n, 1e9, np.float32)])
        self._dlen = (jax.device_put(lengths, sh1) if self.mesh is not None
                      else jax.device_put(lengths))
        self._n_valid = n
        self._resident = True
        logger.info("DB resident: %d rows (%.2f GB, %.2fs)", n,
                    self._demb.nbytes / 2 ** 30, time.time() - t0)

    # -- public API ---------------------------------------------------------
    def search(self, query_embs: np.ndarray, k: int,
               query_lens: np.ndarray | None = None, mincov: float = 0.0):
        """Search normalised-or-not query embeddings [Q,128].

        Returns (scores [Q,k], indices [Q,k]) as numpy, descending, with -1
        indices where fewer than k valid entries exist.
        """
        q = _normalize_rows(np.asarray(query_embs, np.float32))
        k_eff = min(k, self.db.size)
        use_len = query_lens is not None and mincov > 0.0
        qlen = (np.asarray(query_lens, np.float32) if use_len
                else np.zeros(q.shape[0], np.float32))

        if self.mode == "device":
            self._load_resident()
            chunk = self._chunk_eff
            if self._ivf is not None and self.mesh is not None:
                from . import ivf as ivf_mod

                nprobe = min(self.ivf_nprobe, self.ivf_nlist)
                interp = jax.default_backend() != "tpu"
                key = ("ivf", k_eff, nprobe, use_len, float(mincov), interp,
                       self.quantized, self._ivf["dup"], self.ivf_rerank)
                if key not in self._mesh_fns:
                    self._mesh_fns[key] = ivf_mod.build_mesh_ivf_search(
                        self.mesh, k_eff, nprobe, use_len, float(mincov),
                        interpret=interp, quantized=self.quantized,
                        dedup=self._ivf["dup"], rerank=self.ivf_rerank)
                qf = jnp.asarray(q)  # f32 drives the centroid probe
                if self.quantized:
                    q8_np, qs = pallas_scan.quantize_rows(q)
                    qd8 = jnp.asarray(q8_np)
                    scale_arg = self._dscale
                else:
                    if not self.ivf_rerank:  # rerank keeps q f32 (q_hi)
                        qf = qf.astype(self.dtype)
                    qd8, qs, scale_arg = qf, None, self._dlen  # dummies
                vals, idxs = self._mesh_fns[key](
                    qf, qd8, self._demb,
                    self._ivf["centroids"], self._dlen, self._ivf["perm"],
                    jnp.asarray(qlen), scale_arg,
                    self._dhi if self.ivf_rerank else self._demb)
                if self.quantized and not self.ivf_rerank:
                    # rerank values are exact f32 — no dequant rescale
                    vals = vals * jnp.asarray(qs)[:, None]
            elif self.mesh is not None:
                quant = self.quantized and self._fused
                key = (k_eff, chunk, float(mincov), use_len, self._fused, quant)
                if key not in self._mesh_fns:
                    self._mesh_fns[key] = build_mesh_search(
                        self.mesh, k_eff, chunk, float(mincov), use_len,
                        self.selection, self.recall_target, fused=self._fused,
                        quantized=quant)
                if quant:
                    q8, qs = pallas_scan.quantize_rows(q)
                    qd = jnp.asarray(q8)
                elif self._fused:
                    qd = jnp.asarray(q).astype(self.dtype)
                else:
                    qd = jnp.asarray(q)
                vals, idxs = self._mesh_fns[key](
                    qd, self._demb, self._dlen,
                    jnp.asarray([self._n_valid], jnp.int32), jnp.asarray(qlen),
                    self._dscale if quant else self._dlen)  # dummy when flat
                if quant:
                    vals = vals * jnp.asarray(qs)[:, None]
            elif self._ivf is not None:
                from . import ivf as ivf_mod

                if self.quantized:
                    q8_np, qs = pallas_scan.quantize_rows(q)
                    qf, qd8 = jnp.asarray(q), jnp.asarray(q8_np)
                else:
                    qf, qd8, qs = jnp.asarray(q).astype(self.dtype), None, None
                vals, idxs = ivf_mod.ivf_search(
                    qf, self._demb,
                    self._ivf["centroids"], self._ivf["perm"], k_eff,
                    min(self.ivf_nprobe, self.ivf_nlist),
                    tlen=self._dlen, qlen=jnp.asarray(qlen),
                    mincov=float(mincov), use_len=use_len,
                    interpret=jax.default_backend() != "tpu",
                    scales=self._dscale if self.quantized else None, q8=qd8,
                    dedup=self._ivf["dup"],
                    rerank_hi=self._dhi if self.ivf_rerank else None,
                    q_hi=jnp.asarray(q) if self.ivf_rerank else None)
                if self.quantized and not self.ivf_rerank:
                    # rerank values are exact f32 — no dequant rescale
                    vals = vals * jnp.asarray(qs)[:, None]
            elif self._fused and self.quantized:
                q8, qs = pallas_scan.quantize_rows(q)
                vals, idxs = pallas_scan.fused_topk(
                    jnp.asarray(q8), self._demb, self._n_valid, k_eff,
                    tlen=self._dlen, qlen=jnp.asarray(qlen),
                    mincov=float(mincov), use_len=use_len,
                    scales=self._dscale)
                # per-query dequantisation (positive, so -inf stays -inf)
                vals = vals * jnp.asarray(qs)[:, None]
            elif self._fused:
                vals, idxs = pallas_scan.fused_topk(
                    jnp.asarray(q).astype(self.dtype), self._demb,
                    self._n_valid, k_eff,
                    tlen=self._dlen, qlen=jnp.asarray(qlen),
                    mincov=float(mincov), use_len=use_len)
            else:
                vals, idxs = topk_ops.topk_scan(
                    jnp.asarray(q), self._demb, self._n_valid, k_eff, chunk,
                    tlen=self._dlen if use_len else None,
                    qlen=jnp.asarray(qlen) if use_len else None,
                    mincov=float(mincov), selection=self.selection,
                    recall_target=self.recall_target)
            vals = np.asarray(vals, np.float32)
            idxs = np.asarray(idxs)
        elif self.index == "ivf":
            vals, idxs = self._stream_ivf_search(q, k_eff, qlen, mincov,
                                                 use_len)
        else:
            vals, idxs = self._stream_search(q, k_eff, qlen, mincov, use_len)

        idxs = np.where(np.isfinite(vals), idxs, -1)
        if k_eff < k:
            pad_v = np.full((q.shape[0], k - k_eff), -np.inf, np.float32)
            pad_i = np.full((q.shape[0], k - k_eff), -1, idxs.dtype)
            vals = np.concatenate([vals, pad_v], axis=1)
            idxs = np.concatenate([idxs, pad_i], axis=1)
        return vals, idxs

    def _normalised_embeddings(self):
        """Unit-norm embedding view for index builds: the mmap layout is
        stored normalised (memmap used as-is, rows fancy-indexed in bounded
        slabs); raw pt DBs (small) are materialised and normalised."""
        if self.db.normalised:
            return self.db.embeddings()
        return _normalize_rows(np.asarray(self.db.embeddings(),
                                          dtype=np.float32))

    def _db_fingerprint(self):
        """Cheap identity of the DB content for sidecar-staleness checks:
        (rows, dim, embeddings-file size, embeddings-file mtime)."""
        f = getattr(self.db.embeddings(), "filename", None)
        if f is None:
            prefix = getattr(self.db, "prefix", None)
            f = prefix + ".pt" if prefix else None
        fsz = mt = 0
        if f and os.path.exists(f):
            st = os.stat(f)
            fsz, mt = st.st_size, int(st.st_mtime)
        return np.asarray([self.db.size, self.db.dim, fsz, mt], np.int64)

    # -- disk-streaming IVF --------------------------------------------------
    def _load_stream_ivf(self):
        """Build-or-open the cluster-contiguous disk sidecar (ivf.py)."""
        if self._sivf is not None:
            return
        with self._init_lock:
            if self._sivf is not None:
                return
            self._load_stream_ivf_locked()

    def _load_stream_ivf_locked(self):
        from . import ivf as ivf_mod

        t0 = time.time()
        prec = ("int8" if self.quantized
                else "bf16" if self.dtype == jnp.bfloat16 else "f32")
        prefix = getattr(self.db, "prefix", None)
        if not prefix:
            raise ValueError("disk-streaming IVF needs an on-disk DB "
                             "(no prefix to place the sidecars next to)")
        p = f"{prefix}.ivfdisk{self.ivf_nlist}.{prec}"
        fp = self._db_fingerprint()
        if os.path.exists(p + ".npz"):
            self._sivf = ivf_mod.load_disk_ivf(p)
            # the sidecar snapshots the EMBEDDINGS, not just the index — a
            # rebuilt/extended DB must invalidate it or stale rows would be
            # served silently
            old = self._sivf.get("fingerprint")
            if old is None or not np.array_equal(old, fp):
                logger.warning("disk IVF sidecar at %s is stale (DB changed);"
                               " rebuilding", p)
                self._sivf = None
            else:
                logger.info("disk IVF loaded from %s (%.2fs)", p,
                            time.time() - t0)
        if self._sivf is None:
            # cross-PROCESS build guard (self._init_lock only serialises
            # threads of this engine): a CLI run and a server, or two server
            # workers, sharing one DB prefix must not interleave writes into
            # the same sidecar files. flock + re-check; builds are also
            # published via tmp+rename inside write_disk_ivf.
            import fcntl

            with open(p + ".lock", "w") as lk:
                fcntl.flock(lk, fcntl.LOCK_EX)
                if os.path.exists(p + ".npz"):  # another process built it
                    self._sivf = ivf_mod.load_disk_ivf(p)
                    old = self._sivf.get("fingerprint")
                    if old is not None and np.array_equal(old, fp):
                        logger.info("disk IVF built by another process at %s",
                                    p)
                    else:
                        self._sivf = None
                if self._sivf is None:
                    self._sivf = ivf_mod.write_disk_ivf(
                        self._normalised_embeddings(), self.db.lengths(),
                        self.ivf_nlist, p, precision=prec, fingerprint=fp)
                    logger.info("disk IVF built at %s (%.2fs)", p,
                                time.time() - t0)
        self._sivf["dcent"] = jax.device_put(
            self._sivf["centroids"].astype(np.float32))
        self.ivf_nlist = self._sivf["nlist"]  # build may clamp

    def _stream_ivf_search(self, q, k, qlen, mincov, use_len):
        """Sublinear search over a larger-than-HBM DB: stage only the union
        of probed clusters from the disk sidecar and flat-scan the staged
        rows (exact within the probed set).

        Host IO per batch ~ |union(probes)| * cluster_rows * itemsize —
        nprobe/nlist of the DB instead of all of it (plus batch sharing:
        queries probing the same cluster stage it once). Cluster-slot
        padding rows carry +inf length, so they are excluded through the
        scan's length mask (mincov folded to 1.0 with the +inf already
        applied — bit-identical to the flat path's qlen >= tlen*mincov for
        real rows)."""
        self._load_stream_ivf()
        siv = self._sivf
        c_rows, nlist = siv["cluster_rows"], siv["nlist"]
        nprobe = min(self.ivf_nprobe, nlist)
        on_tpu = jax.default_backend() == "tpu"
        fused = (self.dtype == jnp.bfloat16 or self.quantized) and on_tpu
        quant = self.quantized and on_tpu
        if q.shape[0] == 0:  # empty batch: nothing to probe or stage
            return (np.full((0, k), -np.inf, np.float32),
                    np.full((0, k), -1, np.int32))

        t0 = time.time()
        dq = jnp.asarray(q)
        _, dprobe = jax.lax.top_k(
            jnp.dot(dq, siv["dcent"].T, preferred_element_type=jnp.float32),
            nprobe)
        union = np.unique(np.asarray(dprobe))            # sorted cluster ids
        from . import ivf as ivf_mod

        # query-side prep (scan masking always rides the length channel)
        qcap = (np.asarray(qlen, np.float32) if use_len
                else np.full(q.shape[0], 3e38, np.float32))
        dqcap = jnp.asarray(qcap)
        dq8 = dqs = None
        if quant:
            q8_np, qs_np = pallas_scan.quantize_rows(q)
            dq8, dqs = jnp.asarray(q8_np), jnp.asarray(qs_np)

        # staging groups bounded by the stream block size. The non-fused
        # alignment is one cluster slot (BLOCK-aligned), NOT the full scan
        # chunk — padding a small probe union to ndev * 2^20 rows would
        # stage mostly zeros and defeat the sublinear-IO point
        cl_per_group = max(1, self.stream_block // c_rows)
        chunk = min(self.chunk, c_rows)
        mult = self.ndev * (pallas_scan.DEFAULT_TILE if fused else chunk)
        if self.mesh is not None:
            axis = self.mesh.axis_names[0]
            row_sh = NamedSharding(self.mesh, P(axis, None))
            len_sh = NamedSharding(self.mesh, P(axis))
        partial_vals, partial_idxs = [], []
        staged_rows = 0

        # staging (disk range reads + mincov fold) runs on the prefetch pool
        # so host IO overlaps both itself and the async-dispatched device
        # scan of the previous cluster group — same scheme as _stream_search
        def prepare(g0):
            cls = union[g0:g0 + cl_per_group]
            nb = len(cls) * c_rows
            npad = ((nb + mult - 1) // mult) * mult
            blk = np.zeros((npad, self.db.dim), siv["emb"].dtype)
            tl = np.full(npad, np.inf, np.float32)
            rs = (np.ones(npad, np.float32)
                  if siv["scales"] is not None else None)
            perm_sl = np.full(npad, -1, np.int64)
            at = 0
            for a, b in ivf_mod.cluster_runs(cls):  # coalesced reads
                lo, hi = a * c_rows, b * c_rows
                m = hi - lo
                blk[at:at + m] = siv["emb"][lo:hi]
                tl[at:at + m] = siv["lengths"][lo:hi]
                perm_sl[at:at + m] = siv["perm"][lo:hi]
                if rs is not None:
                    rs[at:at + m] = siv["scales"][lo:hi]
                at += m
            # fold mincov into the lengths (+inf padding survives: the scan
            # then masks with tl <= qcap at mincov=1.0). Scale only the
            # finite entries — inf * 0.0 is NaN, and even a discarded
            # np.where branch raises the invalid-value warning.
            tlm = tl.copy()
            fin = np.isfinite(tlm)
            tlm[fin] *= np.float32(mincov if use_len else 0.0)
            if not quant and self.quantized:
                # int8 requested off-TPU: dequantised f32 fallback
                blk = blk.astype(np.float32) * rs[:, None]
            elif not fused and blk.dtype != np.float32:
                blk = blk.astype(np.float32)  # bf16 sidecar off-TPU
            return nb, npad, blk, tlm, rs, perm_sl

        for item in _ordered_prefetch(range(0, len(union), cl_per_group),
                                      prepare):
            nb, npad, blk, tlm, rs, perm_sl = item
            # with duplicates in the layout a group's top-k can hold up to
            # DUP_PREF + 1 copies of one row; inflate so the post-dedup
            # merge still has k unique ids per group (mirrors the device
            # IVF path's ksel)
            kk = min(k * (ivf_mod.DUP_PREF + 1) if siv.get("dup") else k, nb)
            if self.mesh is not None:
                key = ("sivf", kk, fused, quant)
                if key not in self._mesh_fns:
                    self._mesh_fns[key] = build_mesh_search(
                        self.mesh, kk, chunk, 1.0, True, self.selection,
                        self.recall_target, fused=fused, quantized=quant)
                dtl = jax.device_put(tlm, len_sh)
                if quant:
                    vals, idxs = self._mesh_fns[key](
                        dq8, jax.device_put(blk, row_sh), dtl,
                        jnp.asarray([npad], jnp.int32), dqcap,
                        jax.device_put(rs, len_sh))
                    vals = vals * dqs[:, None]
                else:
                    vals, idxs = self._mesh_fns[key](
                        dq.astype(self.dtype) if fused else dq,
                        jax.device_put(blk, row_sh), dtl,
                        jnp.asarray([npad], jnp.int32), dqcap, dtl)
            elif quant:
                vals, idxs = pallas_scan.fused_topk(
                    dq8, jnp.asarray(blk), npad, kk,
                    tlen=jnp.asarray(tlm), qlen=dqcap, mincov=1.0,
                    use_len=True, scales=jnp.asarray(rs))
                vals = vals * dqs[:, None]
            elif fused:
                vals, idxs = pallas_scan.fused_topk(
                    dq.astype(self.dtype), jnp.asarray(blk), npad, kk,
                    tlen=jnp.asarray(tlm), qlen=dqcap, mincov=1.0,
                    use_len=True)
            else:
                vals, idxs = topk_ops.topk_scan(
                    dq, jnp.asarray(blk), npad, kk, min(chunk, npad),
                    tlen=jnp.asarray(tlm), qlen=dqcap, mincov=1.0,
                    selection=self.selection,
                    recall_target=self.recall_target)
            # staged offsets -> original row ids (host, [Q,kk] small)
            iv = np.asarray(idxs)
            orig = np.where(iv >= 0, perm_sl[np.maximum(iv, 0)], -1)
            partial_vals.append(np.asarray(vals, np.float32))
            partial_idxs.append(orig.astype(np.int32))
            staged_rows += nb
        kk = max(v.shape[1] for v in partial_vals)
        pv = np.stack([np.pad(v, ((0, 0), (0, kk - v.shape[1])),
                              constant_values=-np.inf)
                       for v in partial_vals])
        pi = np.stack([np.pad(i, ((0, 0), (0, kk - i.shape[1])),
                              constant_values=-1) for i in partial_idxs])
        if siv.get("dup"):
            # multi-assigned rows (expand > 0 sidecars) can win in several
            # staged groups with identical scores: dedup by original id
            vals, idxs = _np_dedup_topk(
                pv.transpose(1, 0, 2).reshape(q.shape[0], -1),
                pi.transpose(1, 0, 2).reshape(q.shape[0], -1),
                min(k, staged_rows))
        else:
            vals, idxs = topk_ops.merge_partials(
                jnp.asarray(pv), jnp.asarray(pi), min(k, staged_rows))
        vals = np.asarray(vals, np.float32)
        idxs = np.asarray(idxs)
        if vals.shape[1] < k:  # fewer probed rows than k: pad like a miss
            pad = k - vals.shape[1]
            vals = np.pad(vals, ((0, 0), (0, pad)), constant_values=-np.inf)
            idxs = np.pad(idxs, ((0, 0), (0, pad)), constant_values=-1)
        logger.info("stream-IVF: %d/%d clusters staged (%d rows, %.1f%% of "
                    "DB) in %.3fs", len(union), nlist, staged_rows,
                    100.0 * staged_rows / max(len(siv["perm"]), 1),
                    time.time() - t0)
        return np.asarray(vals, np.float32), np.asarray(idxs)

    # -- streaming ----------------------------------------------------------
    def _stream_search(self, q, k, qlen, mincov, use_len):
        t0 = time.time()
        dq = jnp.asarray(q)
        dqlen = jnp.asarray(qlen)
        lengths = self.db.lengths().astype(np.float32) if use_len else None
        partial_vals, partial_idxs = [], []
        block = self.stream_block
        # fused Pallas scan per superblock on TPU bf16/int8; XLA scan otherwise
        on_tpu = jax.default_backend() == "tpu"
        fused = (self.dtype == jnp.bfloat16 or self.quantized) and on_tpu
        quant = self.quantized and on_tpu
        chunk = min(self.chunk, block)
        # with a mesh, each staged superblock is itself row-sharded over the
        # devices, so the aggregate HBM of the mesh sets the effective block
        # size and every chip scans 1/ndev of each superblock
        mult = self.ndev * (pallas_scan.DEFAULT_TILE if fused else chunk)
        if self.mesh is not None:
            axis = self.mesh.axis_names[0]
            row_sh = NamedSharding(self.mesh, P(axis, None))
            len_sh = NamedSharding(self.mesh, P(axis))
            dq_cast = dq.astype(self.dtype) if fused else dq
        dq8 = dqs = None  # lazy int8 query quantisation (quant path)

        # host-side read+normalise+pad runs in a producer thread so disk/mem
        # traffic overlaps the (async-dispatched) device scan of the previous
        # superblock — the streaming double-buffer the reference's faiss
        # block loop lacks (dbsearch.py:232-248 is fully serial). Quantised
        # sidecars (db.codecs.write_quantized_sidecar) are read natively,
        # cutting the disk/page-cache traffic 4x (int8) or 2x (bf16) — at
        # TED scale the host read, not the TPU scan, bounds streaming qps.
        use_i8_side = self.quantized and self.db.has_quant("int8")
        use_bf_side = (not self.quantized and self.dtype == jnp.bfloat16
                       and self.db.has_quant("bf16"))
        if use_i8_side:
            # int8 sidecar scales are shared per 128 consecutive rows:
            # superblock boundaries must fall on scale-block boundaries
            b = pallas_scan.BLOCK
            block = max(b, (block // b) * b)

        def prepare(off):
            rs = None
            if use_i8_side:
                blk, rs = self.db.read_rows_quant(off, off + block, "int8")
                if not quant:  # off-TPU: dequantised f32 fallback
                    blk = blk.astype(np.float32) * rs[:, None]
                    rs = None
            elif use_bf_side:
                blk = self.db.read_rows_quant(off, off + block, "bf16")
            else:
                blk = self.db.read_rows(off, off + block)
            nb = blk.shape[0]
            npad = ((nb + mult - 1) // mult) * mult
            if npad != nb:
                blk = np.concatenate(
                    [blk, np.zeros((npad - nb, blk.shape[1]), blk.dtype)])
                if rs is not None:
                    # padding rows are zeros; give them the tail
                    # block's scale so scales stay block-uniform
                    tail = rs[-1] if nb % pallas_scan.BLOCK else 1.0
                    rs = np.concatenate(
                        [rs, np.full(npad - nb, tail, np.float32)])
            tl = np.full(npad, 1e9, np.float32) if use_len else None
            if use_len:
                tl[:nb] = lengths[off:off + nb]
            if self.mesh is not None and tl is None:
                tl = np.zeros(npad, np.float32)  # mesh fn takes tlen always
            if use_i8_side or use_bf_side:
                pass  # already in device format
            elif quant:
                blk, rs = pallas_scan.quantize_blocks(blk)
            elif self.quantized:
                pass  # int8 requested off-TPU: f32 fallback scan
            elif self.dtype != jnp.float32:
                blk = blk.astype(np.dtype("bfloat16"))
            if blk.base is not None:
                # sidecar/normalised-mmap reads return memmap VIEWS — the
                # disk page-in would otherwise happen lazily inside the
                # consumer's device_put, defeating the staging overlap
                blk = np.array(blk)
            return off, nb, blk, tl, rs

        seen = 0
        # multi-threaded ordered staging: host reads of the next blocks
        # overlap both each other and the (async-dispatched) device scan of
        # the current one — the reference's faiss block loop is fully serial
        # (dbsearch.py:232-248). Quantised sidecars cut the read volume
        # 4x/2x; the pool lifts the single-core memcpy ceiling on top.
        for item in _ordered_prefetch(range(0, self.db.size, block), prepare):
            off, nb, blk, tl, rs = item
            if self.mesh is not None:
                kk = min(k, nb)
                key = ("stream", kk, use_len, fused, quant, float(mincov))
                if key not in self._mesh_fns:
                    self._mesh_fns[key] = build_mesh_search(
                        self.mesh, kk, chunk, float(mincov), use_len,
                        self.selection, self.recall_target, fused=fused,
                        quantized=quant)
                dtl = jax.device_put(tl, len_sh)
                if quant:
                    # int8 superblock: rows + per-row scales sharded together;
                    # queries quantised once, per-query scale applied after
                    if dq8 is None:
                        q8_np, qs_np = pallas_scan.quantize_rows(np.asarray(q))
                        dq8, dqs = jnp.asarray(q8_np), jnp.asarray(qs_np)
                    vals, idxs = self._mesh_fns[key](
                        dq8, jax.device_put(blk, row_sh), dtl,
                        jnp.asarray([nb], jnp.int32), dqlen,
                        jax.device_put(rs, len_sh))
                    vals = vals * dqs[:, None]
                else:
                    vals, idxs = self._mesh_fns[key](
                        dq_cast, jax.device_put(blk, row_sh), dtl,
                        jnp.asarray([nb], jnp.int32), dqlen,
                        dtl)  # dummy scale shard on the non-quantised path
            elif quant:
                if dq8 is None:
                    q8_np, qs_np = pallas_scan.quantize_rows(np.asarray(q))
                    dq8, dqs = jnp.asarray(q8_np), jnp.asarray(qs_np)
                vals, idxs = pallas_scan.fused_topk(
                    dq8, jnp.asarray(blk), nb, min(k, nb),
                    tlen=jnp.asarray(tl) if use_len else None,
                    qlen=dqlen if use_len else None, mincov=float(mincov),
                    use_len=use_len, scales=jnp.asarray(rs))
                vals = vals * dqs[:, None]
            elif fused:
                vals, idxs = pallas_scan.fused_topk(
                    dq.astype(self.dtype), jnp.asarray(blk), nb, min(k, nb),
                    tlen=jnp.asarray(tl) if use_len else None,
                    qlen=dqlen if use_len else None, mincov=float(mincov),
                    use_len=use_len)
            else:
                vals, idxs = topk_ops.topk_scan(
                    dq, jnp.asarray(blk), nb, min(k, nb), chunk,
                    tlen=jnp.asarray(tl) if use_len else None,
                    qlen=dqlen if use_len else None, mincov=float(mincov),
                    selection=self.selection, recall_target=self.recall_target)
            partial_vals.append(vals)
            partial_idxs.append(jnp.where(idxs >= 0, idxs + off, idxs))
            seen += nb
            if len(partial_vals) >= 3:
                # backpressure: dispatch is async and results stay on device,
                # so without a sync a host-staging pool that outpaces the
                # device (small page-cache-hot DBs) would queue arbitrarily
                # many multi-GB superblock buffers in HBM. Blocking on the
                # scan TWO blocks back caps in-flight device inputs at ~3
                # superblocks while leaving the current dispatch overlapped.
                jax.block_until_ready(partial_vals[-3])
            logger.info("%d DB elements, %.3f s", seen, time.time() - t0)
        kk = max(v.shape[1] for v in partial_vals)
        pv = jnp.stack([jnp.pad(v, ((0, 0), (0, kk - v.shape[1])),
                                constant_values=-jnp.inf) for v in partial_vals])
        pi = jnp.stack([jnp.pad(i, ((0, 0), (0, kk - i.shape[1])),
                                constant_values=-1) for i in partial_idxs])
        vals, idxs = topk_ops.merge_partials(pv, pi, min(k, seen))
        logger.info("kNN time: %.3f s (%d vectors)", time.time() - t0, seen)
        return np.asarray(vals, np.float32), np.asarray(idxs)
