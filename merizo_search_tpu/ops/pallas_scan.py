"""Fused Pallas scan for exact flat top-k search.

The XLA scan in ops/topk.py materialises the [Q, chunk] score block in HBM
and re-reads it several times for selection; at 2M rows that costs ~5x the
pure matmul-scan time. This module keeps the scores in VMEM:

Phase A (Pallas kernel, one pass over the DB at HBM bandwidth):
    for each DB tile [TILE, D] staged HBM->VMEM, compute the MXU matmul
    Q[Qp,D] @ tile^T in VMEM and reduce it immediately to per-128-row block
    maxima. Only BM [Qp, N/128] (f32, N/32 bytes per wide row) ever reaches
    HBM — ~0.8% of the score traffic the XLA path writes.

Phase B (XLA, tiny): exact top-k *blocks* per query from BM. Cover argument:
    if a true top-k element's block were not among the top-k blocks by max,
    then >= k blocks would each hold an element larger than it — so taking
    the k best blocks by max is an exact cover of the true top-k elements.

Phase C (XLA): gather those k blocks' rows (k*128 candidates per query),
    recompute their scores (same single-pass 128-deep MXU contraction as
    phase A, so values agree), mask, and take the final exact top-k.

This replaces the reference's faiss IndexFlat block scan + ResultHeap merge
(reference dbsearch.py:213-248) as the production TPU path for bf16-resident
DBs; ops/topk.topk_scan remains the general fallback (fp32 DBs, CPU tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128        # rows per selection block (= lane width)
DEFAULT_TILE = 32768  # DB rows per grid step: bf16 tile = 8 MB VMEM

NEG_INF = jnp.float32(-jnp.inf)


QTILE = 128  # queries per inner kernel step (fills the MXU's 128 output lanes)


def _compiler_params(vmem_bytes: int | None):
    try:
        return pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes)
    except (AttributeError, TypeError):  # pragma: no cover - older jax
        return pltpu.TPUCompilerParams(vmem_limit_bytes=vmem_bytes)


def _bm_kernel(nv_ref, q_ref, db_ref, tlen_ref, qcap_ref, *rest, tile,
               use_len, quantized, qt, sbw):
    """One grid step: scores of ALL query tiles vs one [tile, D] DB slab ->
    block maxima. Two performance-critical layout choices:

    - The query loop lives *inside* the kernel (queries are a few hundred KB
      and sit whole in VMEM), so the score block stays small for any batch
      size and the DB streams from HBM exactly once.
    - Scores are computed TRANSPOSED, s_t = db_tile @ q_tile^T [tile, qt]:
      DB rows land on sublanes, so the per-128-row block max is a tree of
      full-vreg maxes over the sublane axis (~1.3 passes over the scores)
      instead of a 7-step cross-lane shuffle reduction (~7 passes) — the
      VPU reduction, not the MXU matmul, is the kernel's critical path.
      qt=128 also fills all MXU output lanes.
    """
    if quantized:
        rs_ref, bm_ref, sbm_ref = rest
    else:
        (bm_ref, sbm_ref) = rest
    nbt = tile // BLOCK
    step = pl.program_id(0)
    # row r of this tile = block a, offset b (r = a*BLOCK + b); sidecars
    # (tlen, scales) arrive pre-shaped [*, BLOCK] lane-major — a [tile, 1]
    # layout would tile to (8,128) vregs and DMA ~128x padding
    ai = jax.lax.broadcasted_iota(jnp.int32, (nbt, BLOCK, 1), 0)
    bi = jax.lax.broadcasted_iota(jnp.int32, (nbt, BLOCK, 1), 1)
    row_valid = step * tile + ai * BLOCK + bi < nv_ref[0]  # [nbt, BLOCK, 1]
    nqt = q_ref.shape[0] // qt
    for j in range(nqt):                                 # static unroll
        qtile = q_ref[j * qt:(j + 1) * qt, :]
        if quantized:
            # int8 MXU path. Scales are block-uniform (quantize_blocks), so
            # the int32 block max commutes with dequantisation: reduce raw
            # int32 scores and scale only the [nbt, qt] maxima — a per-row
            # multiply over the full score block costs ~2.8x the whole scan.
            # Masked entries get an int sentinel far below any real score
            # (|score| <= 127*127*128 ~ 2.1e6 << 2^31).
            s = jax.lax.dot_general(
                db_ref[:], qtile,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)        # [tile, qt]
            s = s.reshape(nbt, BLOCK, qt)
            sentinel = jnp.int32(-(2 ** 31) + 1)
            if use_len:
                mask = (tlen_ref[:].reshape(nbt, BLOCK, 1)
                        <= qcap_ref[0:1, j * qt:(j + 1) * qt].reshape(1, 1, qt))
                s = jnp.where(mask, s, sentinel)
            s = jnp.where(row_valid, s, sentinel)
            bmt = (jnp.max(s, axis=1).astype(jnp.float32)
                   * rs_ref[:, 0:1]).T                   # [qt, nbt]
        else:
            s = jax.lax.dot_general(
                db_ref[:], qtile,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [tile, qt]
            s = s.reshape(nbt, BLOCK, qt)
            if use_len:
                # tlen_ref holds tlen*mincov and qcap_ref holds qlen, so this
                # is exactly the reference's keep-iff qlen >= tlen*mincov
                mask = (tlen_ref[:].reshape(nbt, BLOCK, 1)
                        <= qcap_ref[0:1, j * qt:(j + 1) * qt].reshape(1, 1, qt))
                s = jnp.where(mask, s, float("-inf"))

            # NOTE: row-validity is masked unconditionally — a pl.when branch
            # to skip it on full tiles breaks Mosaic's software pipeline and
            # costs 4x; the extra where-pass costs ~5%.
            s = jnp.where(row_valid, s, float("-inf"))
            # clamp block maxima to a finite floor: keeps -inf out of BM so
            # the phase-B one-hot gather needs no NaN-guard pass over the
            # full matrix (selection order is unchanged; exact -inf scores
            # are restored by the phase-C rescore)
            bmt = jnp.maximum(jnp.max(s, axis=1), jnp.float32(-3.4e38)).T
        if len(bm_ref.shape) == 3:
            bm_ref[0, j * qt:(j + 1) * qt, :] = bmt      # unaligned-tile path
        else:
            bm_ref[j * qt:(j + 1) * qt, :] = bmt
        # superblock max (whole tile): lets phase B select tiles without
        # re-reducing the BM matrix. TPU lowering forbids 1-lane output
        # blocks, so SBM uses an sbw-lane block revisited for sbw
        # consecutive steps: each step maxes its column in via a one-hot
        # select (read-modify-write stays in VMEM until the block retires).
        sb_lane = jax.lax.broadcasted_iota(jnp.int32, (1, sbw), 1)
        col = step % sbw
        contrib = jnp.where(sb_lane == col,
                            jnp.max(bmt, axis=1, keepdims=True),
                            float("-inf"))               # [qt, sbw]
        cur = sbm_ref[j * qt:(j + 1) * qt, :]
        sbm_ref[j * qt:(j + 1) * qt, :] = jnp.where(
            col == 0, contrib, jnp.maximum(cur, contrib))


@partial(jax.jit, static_argnames=("tile", "use_len", "interpret"))
def blockmax_scan(q, db, n_valid, tlen, qcap, tile=DEFAULT_TILE,
                  use_len=False, interpret=False, scales=None):
    """Phase A. q [Qp,D] (same dtype as db), db [Npad,D] with Npad % tile == 0,
    tlen [Npad] f32 target lengths, qcap [Qp] f32 = qlen/mincov.
    scales [Npad] f32: per-row dequantisation scales for int8 DBs.
    Returns (BM [Qp, Npad/BLOCK], SBM [Qp, Npad/tile]) f32 block / superblock
    maxima. Entries are always finite: bf16 maxima are clamped to a -3.4e38
    floor and int8 masked blocks carry sentinel*scale, so masked blocks are
    merely "very negative" — selection-only values; exact -inf for masked
    rows is restored by the phase-C rescore."""
    qn, d = q.shape
    npad = db.shape[0]
    quantized = scales is not None
    # pad queries to a whole number of query tiles (qt=128 fills the MXU's
    # output lanes; smaller batches use one sublane-aligned tile)
    qt = min(-(-qn // 8) * 8, QTILE)
    qp = -(-qn // qt) * qt
    if qp != qn:
        q = jnp.pad(q, ((0, qp - qn), (0, 0)))
        qcap = jnp.pad(qcap, (0, qp - qn))
    nsteps = npad // tile
    sbw = 128 if nsteps % 128 == 0 else nsteps  # SBM lane-block width
    kernel = partial(_bm_kernel, tile=tile, use_len=use_len,
                     quantized=quantized, qt=qt, sbw=sbw)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                    # n_valid [1]
        pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile // BLOCK, BLOCK), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, qp), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray([n_valid], jnp.int32), q, db,
            tlen.reshape(npad // BLOCK, BLOCK), qcap.reshape(1, qp)]
    if quantized:
        in_specs.append(pl.BlockSpec((tile // BLOCK, BLOCK), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(scales.reshape(npad // BLOCK, BLOCK))
    nbt = tile // BLOCK
    # TPU lowering needs the BM out block's lane dim 128-divisible (or the
    # whole array); production tiles satisfy it, small test tiles fall back
    # to a [step, qp, nbt] layout transposed after the fact (a few MB)
    aligned = nbt % 128 == 0 or nsteps == 1
    if aligned:
        bm_spec = pl.BlockSpec((qp, nbt), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
        bm_shape = jax.ShapeDtypeStruct((qp, npad // BLOCK), jnp.float32)
        post = lambda bm: bm
    else:
        bm_spec = pl.BlockSpec((1, qp, nbt), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        bm_shape = jax.ShapeDtypeStruct((nsteps, qp, nbt), jnp.float32)
        post = lambda bm: bm.transpose(1, 0, 2).reshape(qp, npad // BLOCK)
    bm, sbm = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=(bm_spec,
                   pl.BlockSpec((qp, sbw), lambda i: (0, i // sbw),
                                memory_space=pltpu.VMEM)),
        out_shape=(bm_shape,
                   jax.ShapeDtypeStruct((qp, nsteps), jnp.float32)),
        # [tile, qt] f32 scores + double-buffered db tiles exceed the default
        # 16 MB scoped-vmem budget at the production tile size
        compiler_params=_compiler_params(100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    bm = post(bm)
    return (bm[:qn], sbm[:qn]) if qp != qn else (bm, sbm)


def quantize_rows(x: np.ndarray):
    """Symmetric per-row int8 quantisation (query-side / generic use).

    Returns (q int8 [N,D], scales f32 [N]) with x ~ q * scales[:,None]."""
    x = np.asarray(x, np.float32)
    a = np.max(np.abs(x), axis=1)
    s = np.where(a > 0, a / 127.0, 1.0).astype(np.float32)
    qv = np.clip(np.rint(x / s[:, None]), -127, 127).astype(np.int8)
    return qv, s


def quantize_blocks(x: np.ndarray, block: int = BLOCK):
    """Symmetric int8 quantisation with one shared scale per `block`
    consecutive rows — the DB-side format for the fused int8 scan.

    With a block-uniform scale the int32 block max commutes with
    dequantisation, so the kernel reduces raw int32 scores and applies the
    scale to the 128x-smaller block-max matrix instead of every score
    (a per-row multiply over the full score block costs ~2.8x the whole
    scan). N must divide by `block` (the engine pads first). Returns
    (q int8 [N,D], scales f32 [N]) with scales constant within each block."""
    x = np.asarray(x, np.float32)
    n = x.shape[0]
    nfull = (n // block) * block
    a = (np.abs(x[:nfull]).reshape(-1, block * x.shape[1]).max(axis=1)
         if nfull else np.zeros((0,), np.float32))
    if n != nfull:  # ragged tail shares one scale
        a = np.concatenate([a, [np.max(np.abs(x[nfull:]), initial=0.0)]])
    sb = np.where(a > 0, a / 127.0, 1.0).astype(np.float32)
    s = np.repeat(sb, block)[:n]
    qv = np.clip(np.rint(x / s[:, None]), -127, 127).astype(np.int8)
    return qv, s


SUB = 8  # minimum subblock width for the recursive cover select


def _topk_entries(x, k):
    """Exact top-k entries of x [Q, W] -> (vals [Q,k], idx [Q,k] i32).

    lax.top_k is a full sort (~40x the cost of a max-reduce at W ~ 1e4), so
    wide rows are reduced first with the subblock cover: group W into
    SUB-wide subblocks, find the top-k subblocks by max (recursively), and
    sort only those k*SUB candidates. Same exactness argument as the block
    cover in the module docstring. Measured ~6x faster than direct lax.top_k
    at W=12800, k=100.
    """
    qn, w = x.shape
    if w <= max(2 * k, 256) or w % 8:
        kk = min(k, w)
        v, i = jax.lax.top_k(x, kk)
        if kk < k:
            v = jnp.pad(v, ((0, 0), (0, k - kk)), constant_values=-jnp.inf)
            i = jnp.pad(i, ((0, 0), (0, k - kk)))
        return v, i.astype(jnp.int32)
    # adaptive subblock width: smallest power-of-two sub (>=8) that still
    # leaves nsb > 2k subblocks (so the cover shrinks the row), widened while
    # nsb > 4096 so the [Q, k, nsb] one-hot operand stays bounded
    sub = 8
    while w % (sub * 2) == 0 and w // (sub * 2) > 2 * k and w // sub > 4096:
        sub *= 2
    nsb = w // sub
    if nsb <= 2 * k:  # no meaningful reduction left: sort directly
        v, i = jax.lax.top_k(x, min(k, w))
        return v, i.astype(jnp.int32)
    sb = x.reshape(qn, nsb, sub)
    sm = jnp.max(sb, axis=-1)                            # [Q, nsb]
    kk = min(k, nsb)
    _, sbi = _topk_entries(sm, kk)                       # cover subblocks
    # gather the covered subblocks with a one-hot MXU matmul (XLA lowers
    # per-element dynamic gathers to ~10ns/element scalar loops). One-hot
    # rows select exactly, and HIGHEST precision keeps fp32 values bit-exact;
    # the einsum is tiny (k x nsb x sub).
    onehot = (sbi[:, :, None] == jnp.arange(nsb)[None, None, :]).astype(jnp.float32)
    sbf = jnp.where(jnp.isfinite(sb), sb, jnp.float32(-3.4e38))  # -inf*0 = nan
    cand = jnp.einsum("qkb,qbc->qkc", onehot, sbf,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    cand = jnp.where(cand <= -3.0e38, -jnp.inf, cand)
    v, sel = _topk_entries(cand.reshape(qn, kk * sub), k)
    # map local candidate position -> source column arithmetically:
    # sel = (picked subblock slot) * sub + offset, so gather only the kk
    # subblock ids (one-hot matmul again — NOT take_along_axis)
    slot = sel // sub
    src_sb = _gather_int(sbi, slot)
    idx = src_sb * sub + sel % sub
    return v, idx.astype(jnp.int32)


def _gather_int(src, sel):
    """out[q, i] = src[q, sel[q, i]] for int32 src via a one-hot fp32 matmul.

    XLA's TPU gather runs a ~10 ns/element scalar loop (0.26 ms for a
    [256,100] gather); the MXU one-hot product is ~50x faster. Exact while
    values < 2^24 (fp32 integer range) — selection ids and block ids are
    far below that."""
    qn, w = src.shape
    onehot = (sel[:, :, None] == jnp.arange(w)[None, None, :]).astype(jnp.float32)
    out = jnp.einsum("qkw,qw->qk", onehot, src.astype(jnp.float32),
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out.astype(jnp.int32)


GATHER_G = 25  # blocks gathered per grid step (25 | 100 = default k: no padding)


@partial(jax.jit, static_argnames=("use_len", "interpret"))
def gather_block_scores(q, db, tlen2d, qcap, bidx, n_valid, use_len=False,
                        interpret=False, scales=None):
    """Phase C gather: recompute masked scores of selected DB blocks.

    q [Qp,D], db [Npad,D], tlen2d [NB,BLOCK] f32, qcap [Qp] f32,
    bidx [Qp,KB] i32 (KB % GATHER_G == 0; -1 entries are padding),
    scales [Npad] f32 per-row dequant scales for int8 DBs (else None).
    Returns scores [Qp, KB*BLOCK] f32, -inf where masked/padded.

    The scalar-prefetched bidx drives the BlockSpec index maps, so Mosaic's
    pipeline DMAs exactly the selected 32 KB block slabs from HBM —
    a gather at near-streaming bandwidth instead of XLA's per-slice take.

    int8 path: the dot runs natively int8 -> int32 on the MXU (casting the
    blocks to bf16 instead forces a (32,128)->(16,128) tiling relayout per
    step that costs more than the whole gather), so the recomputed integer
    dot equals phase A's int32 MXU result bit-for-bit before the scale
    multiply.
    """
    qp, d = q.shape
    nb = db.shape[0] // BLOCK
    kb = bidx.shape[1]
    g = GATHER_G
    quantized = scales is not None
    dbb = db.reshape(nb, BLOCK, d)

    def blk_map(gg):
        return lambda i, j, bidx_ref, nv_ref, qcap_ref: (
            jnp.maximum(bidx_ref[i, j * g + gg], 0), 0, 0)

    in_specs = [
        pl.BlockSpec((qp, d), lambda i, j, *_: (0, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((1, BLOCK, d), blk_map(gg), memory_space=pltpu.VMEM)
        for gg in range(g)
    ]
    args = [q] + [dbb] * g
    if use_len:
        in_specs += [pl.BlockSpec((1, 1, BLOCK), blk_map(gg),
                                  memory_space=pltpu.VMEM) for gg in range(g)]
        args += [tlen2d.reshape(nb, 1, BLOCK)] * g
    if quantized:
        in_specs += [pl.BlockSpec((1, 1, BLOCK), blk_map(gg),
                                  memory_space=pltpu.VMEM) for gg in range(g)]
        args += [scales.reshape(nb, 1, BLOCK)] * g

    def kernel(bidx_ref, nv_ref, qcap_ref, q_ref, *rest):
        out_ref = rest[-1]
        db_vals = [rest[gg][:].reshape(BLOCK, d) for gg in range(g)]
        i, j = pl.program_id(0), pl.program_id(1)
        blocks = jnp.concatenate(db_vals, axis=0)                # [g*BLOCK, D]
        # extract query row i without a dynamic sublane slice (Mosaic needs
        # statically aligned slices): one-hot mask + sum over the tiny q block
        rows = jax.lax.broadcasted_iota(jnp.int32, (q_ref.shape[0], 1), 0)
        if quantized:
            q_row = jnp.sum(jnp.where(rows == i, q_ref[:], 0).astype(jnp.int32),
                            axis=0, keepdims=True).astype(jnp.int8)  # [1, D]
            s = jax.lax.dot_general(
                q_row, blocks, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        else:
            q_row = jnp.sum(jnp.where(rows == i, q_ref[:], 0).astype(jnp.float32),
                            axis=0, keepdims=True).astype(blocks.dtype)  # [1, D]
            s = jax.lax.dot_general(
                q_row, blocks, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)              # [1, g*BLOCK]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)
        cols = jnp.concatenate(
            [bidx_ref[i, j * g + gg] * BLOCK + lane for gg in range(g)], axis=1)
        mask = jnp.logical_and(cols >= 0, cols < nv_ref[0])      # bidx<0 = pad
        base = 1
        if use_len:
            tl = jnp.concatenate(
                [rest[g + gg][:].reshape(1, BLOCK) for gg in range(g)], axis=1)
            mask = jnp.logical_and(mask, tl <= qcap_ref[i])
            base = 2
        if quantized:
            rs = jnp.concatenate(
                [rest[base * g + gg][:].reshape(1, BLOCK) for gg in range(g)],
                axis=1)
            s = s * rs
        s = jnp.where(mask, s, float("-inf"))
        out_ref[:] = s.reshape(1, 1, g, BLOCK)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(qp, kb // g),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, g, BLOCK), lambda i, j, *_: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((qp, kb // g, g, BLOCK), jnp.float32),
        interpret=interpret,
    )(bidx, jnp.asarray([n_valid], jnp.int32), qcap, *args)
    return out.reshape(qp, kb * BLOCK)


@partial(jax.jit, static_argnames=("k", "tile", "use_len", "interpret"))
def fused_topk(q, db, n_valid, k, tlen=None, qlen=None, mincov=0.0,
               tile=DEFAULT_TILE, use_len=False, interpret=False,
               scales=None):
    """Exact top-k inner-product search with the fused Pallas scan.

    q    [Q, D]  queries, same dtype as db (bf16 on the production path)
    db   [Npad, D], Npad % tile == 0, rows >= n_valid are padding
    scales [Npad] f32: per-row dequant scales when db is int8-quantised.
        The int8 scan halves HBM traffic and uses the 2x-rate int8 MXU
        path; results are the exact top-k of the *quantised* scores
        (cosine error ~ the 1/255 row quantisation step).
    Returns (scores [Q,k] f32, indices [Q,k] i32), descending; masked/padded
    entries carry -inf / -1.
    """
    qn, d = q.shape
    npad = db.shape[0]
    # pad queries to the sublane multiple of the storage dtype
    sub = 16 if q.dtype == jnp.bfloat16 else (32 if q.dtype == jnp.int8 else 8)
    qp = ((qn + sub - 1) // sub) * sub
    if qp != qn:
        q = jnp.pad(q, ((0, qp - qn), (0, 0)))
    # the kernels mask with tl_scaled <= qcap; feeding tl_scaled = tlen*mincov
    # and qcap = qlen makes the comparison bit-identical to the XLA path's
    # qlen >= tlen*mincov (reference dbsearch.py:76) — dividing qlen by mincov
    # instead would disagree at f32 coverage boundaries.
    if use_len:
        tl = tlen * jnp.float32(mincov)
        qcap = jnp.pad(qlen, (0, qp - qn)) if qp != qn else qlen
    else:
        tl = (tlen if tlen is not None else jnp.zeros((npad,), jnp.float32))
        qcap = jnp.full((qp,), jnp.float32(np.inf))

    # Phase A: block maxima at HBM bandwidth
    bm, sbm = blockmax_scan(q, db, n_valid, tl, qcap, tile=tile,
                            use_len=use_len, interpret=interpret,
                            scales=scales)  # [Qp, NB], [Qp, NSB]

    # Phase B: exact top-k blocks per query. Superblock (= tile) maxima were
    # computed in-kernel, so selection starts from SBM [Qp, NSB] and never
    # re-reduces the big BM matrix: pick the top-k superblocks (same cover
    # argument one level up), gather their BM rows with a one-hot MXU matmul
    # (one streaming read of BM), then top-k blocks among those candidates.
    # Chain of covers: a true top-k element's superblock must be selected
    # (else k superblocks each hold a larger element), and within the
    # candidate set its block must be selected (same argument on block maxima).
    nb = npad // BLOCK
    nbt = tile // BLOCK
    nsb = npad // tile
    kb = min(k, nb)
    if nsb >= 2 * min(k, nsb) and nsb >= 2:
        ksb = min(k, nsb)
        _, sbi = _topk_entries(sbm, ksb)                 # [Qp, ksb] tile ids
        # gather the selected superblocks' BM slabs with a one-hot MXU
        # matmul — the only re-read of BM (take_along_axis instead forces a
        # full-BM relayout copy before XLA's gather)
        onehot = (sbi[:, :, None] == jnp.arange(nsb)[None, None, :]
                  ).astype(jnp.float32)
        # BM is finite by construction (kernel clamps to -3.4e38), so the
        # one-hot product needs no NaN guard
        cand_bm = jnp.einsum("qks,qsb->qkb", onehot, bm.reshape(qp, nsb, nbt),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
        cand_bm = jnp.where(cand_bm <= -3.0e38, -jnp.inf, cand_bm)
        _, bsel = _topk_entries(cand_bm.reshape(qp, ksb * nbt), kb)
        # local candidate -> global block id arithmetically (gathered values
        # are superblock ids < 2^24, exact in the fp32 one-hot product)
        bidx = _gather_int(sbi, bsel // nbt) * nbt + bsel % nbt
    else:
        _, bidx = _topk_entries(bm, kb)                  # [Qp, kb] block ids

    # Phase C: recompute masked scores of only the selected blocks (Pallas
    # gather at streaming bandwidth) and take the final exact top-k.
    kbp = ((kb + GATHER_G - 1) // GATHER_G) * GATHER_G
    bidx = jnp.pad(bidx, ((0, 0), (0, kbp - kb)), constant_values=-1)
    qc = q  # int8 queries stay int8: the gather kernel runs the native int8 MXU dot
    scores = gather_block_scores(qc, db, tl.reshape(nb, BLOCK), qcap, bidx,
                                 n_valid, use_len=use_len, interpret=interpret,
                                 scales=scales)
    v, sel = _topk_entries(scores, k)
    # candidate slot -> db row arithmetically: gather only block ids
    # (< 2^24, exact in the fp32 one-hot product) and rebuild the row id
    # in int32 — a take_along_axis here costs ~0.26 ms in scalar gathers
    idx = _gather_int(bidx, sel // BLOCK) * BLOCK + sel % BLOCK
    idx = jnp.where(jnp.isfinite(v), idx, -1)
    return v[:qn], idx[:qn].astype(jnp.int32)
