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

    Row-validity (db rows >= n_valid are padding) is enforced here, NOT in
    phase A: masking per-score in the kernel costs a full VPU pass over the
    [tile, qt] score block — as much as the max reduction itself — so the
    kernel reduces unmasked scores and masks only the [qt, nbt] *block maxima*
    (1/128th the work). Fully-padded blocks are exactly masked; the single
    block straddling n_valid may carry an inflated max (padding rows are
    normally zeros, but any value is safe), which can displace at most one
    true block from the selection. Phase B therefore selects the top-(k+1)
    blocks and force-includes the straddling block; phase C masks padded rows
    exactly. The same argument applies one level up for superblock selection.

Phase C (XLA): gather those k blocks' rows (k*128 candidates per query),
    recompute their scores (same single-pass 128-deep MXU contraction as
    phase A, so values agree), mask, and take the final exact top-k.

This replaces the reference's faiss IndexFlat block scan + ResultHeap merge
(reference dbsearch.py:213-248) as the production TPU path for bf16-resident
DBs; ops/topk.topk_scan remains the general fallback (fp32 DBs, CPU tests).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128        # rows per selection block (= lane width)
DEFAULT_TILE = 32768  # DB rows per grid step: bf16 tile = 8 MB VMEM

NEG_INF = np.float32(-np.inf)


QTILE = 128  # queries per inner kernel step (fills the MXU's 128 output lanes)


def _compiler_params(vmem_bytes: int | None):
    try:
        return pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes)
    except (AttributeError, TypeError):  # pragma: no cover - older jax
        return pltpu.TPUCompilerParams(vmem_limit_bytes=vmem_bytes)


def _bm_kernel(nv_ref, q_ref, db_ref, *rest, tile,
               use_len, quantized, qt, sbw, nslab, bm_mode):
    """One grid step: scores of ALL query tiles vs one [tile, D] DB slab ->
    block maxima. Three performance-critical layout choices:

    - The query loop lives *inside* the kernel (queries are a few hundred KB
      and sit whole in VMEM), so the score block stays small for any batch
      size and the DB streams from HBM exactly once.
    - Scores are computed TRANSPOSED, s_t = db_tile @ q_tile^T [tile, qt]:
      DB rows land on sublanes, so the per-128-row block max is a tree of
      full-vreg maxes over the sublane axis (~1.3 passes over the scores)
      instead of a 7-step cross-lane shuffle reduction (~7 passes) — the
      VPU reduction, not the MXU matmul, is the kernel's critical path.
      qt=128 also fills all MXU output lanes.
    - The tile is processed in `nslab` row sub-slabs, dot / block-max
      interleaved per slab, so Mosaic can overlap slab r+1's MXU matmul
      with slab r's VPU reduce (measured -4% bf16 / -7% int8 phase A vs
      one tile-wide dot followed by one tile-wide reduce).
    """
    if use_len and quantized:
        tlen_ref, qcap_ref, rs_ref, bm_ref, sbm_ref = rest
    elif use_len:
        tlen_ref, qcap_ref, bm_ref, sbm_ref = rest
    elif quantized:
        rs_ref, bm_ref, sbm_ref = rest
    else:
        bm_ref, sbm_ref = rest
    nbt = tile // BLOCK
    step = pl.program_id(0)
    # Row-validity is enforced at BLOCK granularity (see module docstring):
    # a block is kept iff it contains any valid row. This replaces a full
    # [tile, qt] where-pass over the scores — the single largest VPU cost of
    # the old kernel — with a [1, nbt] mask on the block maxima. The one
    # straddling block's max may be inflated by padding rows; phase B
    # compensates exactly. Sidecars (tlen, scales) arrive pre-shaped
    # [*, BLOCK] lane-major — a [tile, 1] layout would tile to (8,128) vregs
    # and DMA ~128x padding.
    gb = step * nbt + jax.lax.broadcasted_iota(jnp.int32, (1, nbt), 1)
    blk_valid = gb * BLOCK < nv_ref[0]                   # [1, nbt]
    nqt = q_ref.shape[0] // qt
    slab = tile // nslab
    nbt_s = slab // BLOCK
    for j in range(nqt):                                 # static unroll
        qtile = q_ref[j * qt:(j + 1) * qt, :]
        parts = []
        for r in range(nslab):                           # static unroll
            sub = db_ref[r * slab:(r + 1) * slab, :]
            if quantized:
                # int8 MXU path. Scales are block-uniform (quantize_blocks —
                # NOT quantize_rows; see the blockmax_scan docstring), so the
                # int32 block max commutes with dequantisation: reduce raw
                # int32 scores and scale only the [nbt, qt] maxima — a
                # per-row multiply over the full score block costs ~2.8x the
                # whole scan. Length-masked entries get an int sentinel far
                # below any real score (|score| <= 127*127*128 ~ 2.1e6 << 2^31).
                s = jax.lax.dot_general(
                    sub, qtile,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)    # [slab, qt]
                s = s.reshape(nbt_s, BLOCK, qt)
                if use_len:
                    sentinel = np.int32(-(2 ** 31) + 1)
                    mask = (tlen_ref[:].reshape(nbt, BLOCK, 1)
                            [r * nbt_s:(r + 1) * nbt_s]
                            <= qcap_ref[0:1, j * qt:(j + 1) * qt]
                            .reshape(1, 1, qt))
                    s = jnp.where(mask, s, sentinel)
                parts.append(jnp.max(s, axis=1).astype(jnp.float32)
                             * rs_ref[r * nbt_s:(r + 1) * nbt_s, 0:1])
            else:
                s = jax.lax.dot_general(
                    sub, qtile,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [slab, qt]
                s = s.reshape(nbt_s, BLOCK, qt)
                if use_len:
                    # tlen_ref holds tlen*mincov and qcap_ref holds qlen, so
                    # this is exactly the reference's keep-iff
                    # qlen >= tlen*mincov
                    mask = (tlen_ref[:].reshape(nbt, BLOCK, 1)
                            [r * nbt_s:(r + 1) * nbt_s]
                            <= qcap_ref[0:1, j * qt:(j + 1) * qt]
                            .reshape(1, 1, qt))
                    s = jnp.where(mask, s, float("-inf"))
                parts.append(jnp.max(s, axis=1))
        bmt = jnp.concatenate(parts, axis=0).T           # [qt, nbt]
        # block-validity mask + finite clamp on the tiny [qt, nbt] maxima:
        # fully-padded blocks go to a -3.4e38 floor (selection-only value —
        # keeps -inf out of BM so phase B's one-hot gathers need no NaN
        # guard; exact -inf for masked rows is restored by the phase-C
        # rescore), and bf16 tlen-masked -inf maxima are clamped likewise.
        bmt = jnp.where(blk_valid, jnp.maximum(bmt, np.float32(-3.4e38)),
                        np.float32(-3.4e38))
        if bm_mode == "split":
            # CLEAN full-block write: BM is laid out [nsteps, Qp, nbt] with
            # step i writing block (i, :, :) — every grid step stores a
            # whole fresh block, so there is no revisit and no one-hot
            # read-modify-write select (the "grouped" mode's RMW costs
            # ~0.4 ms/batch of VPU at Q=256 int8 — ~12% of phase A).
            # (A [8, Qp, nsteps/8, nbt] variant is un-lowerable: Mosaic
            # requires the block's last two dims divisible by (8, 128) or
            # equal to the array's.) Phase B consumes the step-major
            # layout natively (_select_blocks), paying no relayout either.
            bm_ref[0, j * qt:(j + 1) * qt, :] = bmt
        elif bm_mode == "grouped":
            # BM is written natively as [Qp, nsteps, nbt] so phase B's
            # one-hot slab einsum consumes it with NO relayout (the
            # contraction dim s sits on sublanes already — XLA's relayout
            # of the flat [Qp, NB] BM cost ~0.4 ms/batch at Q=256). A
            # (qp, 1, nbt) out block would need a 1-sublane store, which
            # Mosaic rejects, so the block covers 8 superblocks and is
            # revisited for 8 consecutive steps; each step writes its
            # sublane slot via a one-hot select (every slot is written
            # exactly once before the block retires, so no init needed).
            # Measured alternative: static-index (qt, 1, nbt) stores under
            # 8 pl.when branches lower as strided masked stores and run
            # ~2x SLOWER than this full-block select (7.9 vs 3.6 ms/batch
            # phase A at Q=256 int8) — the RMW's ~0.4 ms VPU cost is the
            # cheapest layout Mosaic supports for this write pattern.
            mid = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
            cur = bm_ref[j * qt:(j + 1) * qt, :, :]
            bm_ref[j * qt:(j + 1) * qt, :, :] = jnp.where(
                mid == step % 8, bmt[:, None, :], cur)
        elif bm_mode == "per_step":
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


@partial(jax.jit, static_argnames=("tile", "use_len", "interpret",
                                   "allow_split"))
def blockmax_scan(q, db, n_valid, tlen, qcap, tile=DEFAULT_TILE,
                  use_len=False, interpret=False, scales=None,
                  allow_split=False):
    """Phase A. q [Qp,D] (same dtype as db), db [Npad,D] with Npad % tile == 0,
    tlen [Npad] f32 target lengths, qcap [Qp] f32 = qlen/mincov.
    scales [Npad] f32: dequantisation scales for int8 DBs. REQUIRED to be
    block-uniform (one shared scale per 128-row block, i.e. produced by
    `quantize_blocks`, not `quantize_rows`): the kernel reduces raw int32
    scores and dequantises only the block maxima with each block's first
    row's scale, so per-row scales would silently corrupt phase B's block
    selection.
    Returns (BM, SBM [Qp, Npad/tile]) f32 block / superblock maxima. BM is
    3-D [Qp, NSB, NBT] — superblock-major with the per-superblock block
    maxima minor — written in that layout by the kernel so phase B's
    one-hot slab gather contracts over the superblock dim with no relayout
    (flatten with reshape if a flat [Qp, NB] view is needed; that pays the
    relayout the 3-D layout avoids). With allow_split=True (set by
    fused_topk when the superblock select will run) multi-step grids
    return BM step-major [NSB, Qp, NBT] instead — BM[s, q, b] — which
    the kernel writes as one clean full block per step with NO
    read-modify-write (the grouped mode's one-hot RMW costs ~0.4 ms/batch
    at Q=256); _select_blocks consumes it natively (step_major=True).
    Entries are always finite (clamped to a -3.4e38 floor) —
    selection-only values; exact -inf for masked rows is restored by the
    phase-C rescore. Row-validity (rows >= n_valid) is masked at block
    granularity only: the one block straddling n_valid may carry an inflated
    max, which `fused_topk` compensates for exactly (module docstring)."""
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
    # row sub-slabs for MXU/VPU interleave (see _bm_kernel); int8's faster
    # matmul leaves more reduce time to hide, so it splits finer
    nslab = max(0, int(os.environ.get("MERIZO_NSLAB", "0"))
                ) or (4 if quantized else 2)
    while tile // nslab < BLOCK or (tile // nslab) % BLOCK:
        nslab //= 2
    nbt = tile // BLOCK
    # BM layout (see _bm_kernel): "split" writes clean full blocks in the
    # 4D [8, Qp, nsteps/8, nbt] layout (production: no RMW, no relayout);
    # "grouped" writes the einsum-ready 3D [Qp, nsteps, nbt] via a one-hot
    # RMW; "flat2d"/"per_step" are fallbacks for grids the grouped block
    # can't tile (reshaped after the fact).
    if allow_split and nsteps > 1:
        bm_mode = "split"
    elif nbt % 128 == 0 and nsteps % 8 == 0 and nsteps > 1:
        bm_mode = "grouped"
    elif nbt % 128 == 0 or nsteps == 1:
        bm_mode = "flat2d"
    else:
        bm_mode = "per_step"
    kernel = partial(_bm_kernel, tile=tile, use_len=use_len,
                     quantized=quantized, qt=qt, sbw=sbw, nslab=nslab,
                     bm_mode=bm_mode)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                    # n_valid [1]
        pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray([n_valid], jnp.int32), q, db]
    if use_len:
        # tlen/qcap sidecars are only streamed when length filtering is on —
        # the tlen block alone is 128 KB of needless DMA per step otherwise
        in_specs += [
            pl.BlockSpec((tile // BLOCK, BLOCK), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        args += [tlen.reshape(npad // BLOCK, BLOCK), qcap.reshape(1, qp)]
    if quantized:
        in_specs.append(pl.BlockSpec((tile // BLOCK, BLOCK), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(scales.reshape(npad // BLOCK, BLOCK))
    if bm_mode == "split":
        bm_spec = pl.BlockSpec((1, qp, nbt), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        bm_shape = jax.ShapeDtypeStruct((nsteps, qp, nbt), jnp.float32)
        post = lambda bm: bm
    elif bm_mode == "grouped":
        bm_spec = pl.BlockSpec((qp, 8, nbt), lambda i: (0, i // 8, 0),
                               memory_space=pltpu.VMEM)
        bm_shape = jax.ShapeDtypeStruct((qp, nsteps, nbt), jnp.float32)
        post = lambda bm: bm
    elif bm_mode == "flat2d":
        bm_spec = pl.BlockSpec((qp, nbt), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
        bm_shape = jax.ShapeDtypeStruct((qp, npad // BLOCK), jnp.float32)
        post = lambda bm: bm.reshape(qp, nsteps, nbt)
    else:
        bm_spec = pl.BlockSpec((1, qp, nbt), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        bm_shape = jax.ShapeDtypeStruct((nsteps, qp, nbt), jnp.float32)
        post = lambda bm: bm.transpose(1, 0, 2)
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
    if qp != qn:
        bm = bm[:, :qn] if bm_mode == "split" else bm[:qn]
        sbm = sbm[:qn]
    return bm, sbm


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


# Precision for the one-hot gather matmuls: ASYMMETRIC (DEFAULT for the
# one-hot operand, HIGHEST for the value operand). The value side MUST be
# HIGHEST: measured on a v5e (tools/probe_onehot_precision.py), HIGH
# (2-term bf16 split, ~16 mantissa bits) loses the low ~8 bits of f32
# values (max rel err ~1.5e-5) and integer gathers are exact only below
# ~2^16 — block ids at production per-device DB sizes exceed that (45M
# rows -> nb ~ 3.6e5), which would return wrong row ids silently. The
# one-hot operand needs NO splitting: its entries are exactly 0.0/1.0,
# both exactly representable in ONE bf16 term, so (DEFAULT, HIGHEST)
# computes onehot x (3-term f32 split) — bit-exact like symmetric HIGHEST
# (re-probed on the v5e with runtime-index one-hots: int-exact through
# 2^24, zero f32 mismatches) at half the MXU passes (3 vs 6). Order
# matters: every gather in this module passes the one-hot as the FIRST
# einsum operand.
ONEHOT_PRECISION = (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST)

SUB = 8  # minimum subblock width for the recursive cover select
NEG_CAP = np.float32(-3.4e38)  # finite stand-in for -inf during selection


def _best_factor(n: int, lanes: int = 1, cap: int = 8192) -> int:
    """Split n = a*b for the two-level one-hot gather, returning a.

    The level-1 intermediate t is [Q, k, b*lanes] and is materialised
    (written + re-read), so its traffic scales with b — while the one-hot
    compare cost scales with a and the MXU work is split-invariant. The
    sweet spot is therefore the SMALLEST b with b*lanes >= 128 (one full
    lane tile), i.e. the largest a — not the sqrt-balanced split: at
    nsb=3264/sub=8 the sqrt split makes t 53 MB vs 13 MB for the 128-lane
    split (~4x the HBM traffic of the gather). a is capped (default 8192)
    to bound the compare cost of building the level-1 one-hot.
    Returns 1 if n has no suitable divisor (caller falls back to flat)."""
    target_b = max(1, -(-128 // max(lanes, 1)))
    b = target_b
    while b <= n and (n % b or n // b > cap):
        b += 1
    if b > n:
        return 1
    a = n // b
    return a if a > 1 else 1


def _gather_subblocks(sb, sbi):
    """out[q, k, :] = sb[q, sbi[q, k], :] for finite f32 sb [Q, nsb, sub].

    XLA lowers per-element dynamic gathers to ~10ns/element scalar loops, so
    gathers ride the MXU as one-hot matmuls instead. A flat one-hot operand
    is [Q, k, nsb] — at nsb ~ thousands that materialises hundreds of MB per
    call — so wide gathers are factorised: with nsb = A*B, gather the A-level
    row group with a [Q, k, A] one-hot matmul, then pick the B-level slot
    with a [Q, k, B] elementwise select. B is chosen as the smallest group
    count filling one 128-lane tile (see _best_factor) so the materialised
    [Q, k, B*sub] intermediate stays small. fp32 one-hot products are
    bit-exact for finite values."""
    qn, nsb, sub = sb.shape
    kk = sbi.shape[1]
    a = _best_factor(nsb, lanes=sub) if nsb >= 1024 else 1
    if a > 1:
        b = nsb // a
        hi, lo = sbi // b, sbi % b
        ohh = (hi[:, :, None] == np.arange(a)[None, None, :]).astype(jnp.float32)
        t = jnp.einsum("qka,qac->qkc", ohh, sb.reshape(qn, a, b * sub),
                       preferred_element_type=jnp.float32,
                       precision=ONEHOT_PRECISION)
        ohl = (lo[:, :, None] == np.arange(b)[None, None, :]).astype(jnp.float32)
        return jnp.sum(t.reshape(qn, kk, b, sub) * ohl[:, :, :, None], axis=2)
    onehot = (sbi[:, :, None] == np.arange(nsb)[None, None, :]).astype(jnp.float32)
    return jnp.einsum("qkb,qbc->qkc", onehot, sb,
                      preferred_element_type=jnp.float32,
                      precision=ONEHOT_PRECISION)


def _topk_finite(x, k):
    """Exact top-k of FINITE f32 x [Q, W] (callers clamp -inf to NEG_CAP).

    lax.top_k is a full sort (~40x the cost of a max-reduce at W ~ 1e4), so
    wide rows are reduced first with the subblock cover: group W into
    SUB-wide subblocks, find the top-k subblocks by max (recursively), and
    sort only those k*SUB candidates. Same exactness argument as the block
    cover in the module docstring. Measured ~6x faster than direct lax.top_k
    at W=12800, k=100."""
    qn, w = x.shape
    if w <= max(2 * k, 256) or w % 8:
        kk = min(k, w)
        v, i = jax.lax.top_k(x, kk)
        if kk < k:
            v = jnp.pad(v, ((0, 0), (0, k - kk)), constant_values=NEG_CAP)
            i = jnp.pad(i, ((0, 0), (0, k - kk)))
        return v, i.astype(jnp.int32)
    # subblock width: the level-1 max reduce is one cheap full-width pass,
    # so wider subblocks (straight to a narrow direct sort) beat a deep
    # sub=8 cascade — measured r4 on the production shapes: sub=32 cuts
    # [Q,26112]->101 from 0.30 to 0.24 ms and [Q,13056]->100 from 0.22 to
    # 0.14 ms vs sub=8 (sub=64 loses again: the k*sub candidate sort grows
    # faster than the nsb sort shrinks). Take the widest sub in {32,16,8}
    # that divides w and leaves nsb >= max(2k, 256) subblocks (so every
    # level still covers exactly and the reduce is meaningful).
    floor_nsb = max(2 * k, 256)
    sub = 8
    while sub < 32 and w % (sub * 2) == 0 and w // (sub * 2) >= floor_nsb:
        sub *= 2
    nsb = w // sub
    if nsb <= 2 * k:  # no meaningful reduction left: sort directly
        v, i = jax.lax.top_k(x, min(k, w))
        return v, i.astype(jnp.int32)
    sb = x.reshape(qn, nsb, sub)
    sm = jnp.max(sb, axis=-1)                            # [Q, nsb]
    kk = min(k, nsb)
    _, sbi = _topk_finite(sm, kk)                        # cover subblocks
    cand = _gather_subblocks(sb, sbi)                    # [Q, kk, sub]
    v, sel = _topk_finite(cand.reshape(qn, kk * sub), k)
    # map local candidate position -> source column arithmetically:
    # sel = (picked subblock slot) * sub + offset, so gather only the kk
    # subblock ids (one-hot matmul again — NOT take_along_axis)
    slot = sel // sub
    src_sb = _gather_int(sbi, slot)
    idx = src_sb * sub + sel % sub
    return v, idx.astype(jnp.int32)


def _topk_entries(x, k):
    """Exact top-k entries of x [Q, W] -> (vals [Q,k], idx [Q,k] i32).

    Clamps -inf inputs to a finite floor once, runs the finite-domain
    recursive cover select (`_topk_finite` — no per-level NaN guards), and
    restores -inf in the returned values."""
    x = jnp.where(jnp.isfinite(x), x, NEG_CAP)
    v, i = _topk_finite(x, k)
    return jnp.where(v <= -3.0e38, -jnp.inf, v), i


def _topk_entries_capped(x, k):
    """_topk_entries for inputs ALREADY masked with the finite NEG_CAP
    sentinel (the phase-C gathers emit it): skips the full-width isfinite
    clamp pass — one read+write of the [Q, ~k*BLOCK] score matrix — and
    only restores -inf in the tiny [Q, k] output."""
    v, i = _topk_finite(x, k)
    return jnp.where(v <= -3.0e38, -jnp.inf, v), i


def _gather_int(src, sel):
    """out[q, i] = src[q, sel[q, i]] for int32 src via a one-hot fp32 matmul.

    XLA's TPU gather runs a ~10 ns/element scalar loop (0.26 ms for a
    [256,100] gather); the MXU one-hot product is ~50x faster. Exact while
    values < 2^24 (fp32 integer range, guaranteed by ONEHOT_PRECISION =
    HIGHEST) — block ids reach ~2^19 at production per-device DB sizes."""
    qn, w = src.shape
    onehot = (sel[:, :, None] == np.arange(w)[None, None, :]).astype(jnp.float32)
    out = jnp.einsum("qkw,qw->qk", onehot, src.astype(jnp.float32),
                     preferred_element_type=jnp.float32,
                     precision=ONEHOT_PRECISION)
    return out.astype(jnp.int32)


def _gather_blockvec_f32(vec, ids):
    """out[q, j] = vec[ids[q, j]] for f32 vec [W], ids [Q, J] i32 (>= 0).

    Factorised one-hot contraction (W = A*B: row-group matmul + in-group
    select), same bit-exactness argument as _gather_subblocks — used to
    gather per-block dequant scales so phase C needs no scale DMAs."""
    w = vec.shape[0]
    qn, jj = ids.shape
    a = _best_factor(w, lanes=1) if w >= 1024 else 1
    if a > 1:
        b = w // a
        hi, lo = ids // b, ids % b
        ohh = (hi[:, :, None] == np.arange(a)[None, None, :]).astype(jnp.float32)
        t = jnp.einsum("qja,ab->qjb", ohh, vec.reshape(a, b),
                       preferred_element_type=jnp.float32,
                       precision=ONEHOT_PRECISION)
        ohl = (lo[:, :, None] == np.arange(b)[None, None, :]).astype(jnp.float32)
        return jnp.sum(t * ohl, axis=2)
    onehot = (ids[:, :, None] == np.arange(w)[None, None, :]).astype(jnp.float32)
    return jnp.einsum("qjw,w->qj", onehot, vec,
                      preferred_element_type=jnp.float32,
                      precision=ONEHOT_PRECISION)


def _gather_chunking(kb: int, qp: int, d: int, itemsize: int,
                     unroll: int, nslots: int = 2) -> tuple[int, int]:
    """Column chunking for gather_block_scores_dma: (nchunks, chunk_width).

    One pallas_call's column count is bounded by the SMEM scalar-prefetch
    budget for bidx (~512 KB of the ~1 MB/core) and the VMEM double-buffered
    slab scratch (~64 MB of the 100 MB scoped budget; sidecars + out rows
    use the rest). Wide selections (IVF probes can select thousands of
    blocks per query) are ceil-split into the fewest chunks under the cap
    with balanced widths, so a kb just over the cap pads by one unroll
    group instead of a whole extra cap-width of masked (but still DMA'd)
    columns. chunk_width is always a multiple of unroll; nchunks == 1
    means no chunking (kb fits one call)."""
    smem_cols = (512 * 1024 // (4 * qp)) // unroll * unroll
    vmem_cols = (64 * 1024 * 1024
                 // (nslots * BLOCK * d * itemsize)) // unroll * unroll
    cap = max(unroll, min(smem_cols, vmem_cols))
    if kb <= cap:
        return 1, kb
    nchunks = -(-kb // cap)
    chunk = -(-(-(-kb // nchunks)) // unroll) * unroll
    return nchunks, chunk


GATHER_G = 25  # retained for callers that pre-pad bidx; gather_block_scores
               # itself now picks the group size per kb (see _pick_gather_g)


@partial(jax.jit, static_argnames=("use_len", "quantized"))
def gather_block_scores_dma(q, db, tlen2d, qcap, bidx, n_valid, use_len=False,
                            quantized=False, scale_sel=None):
    """Phase C gather with kernel-managed DMA (TPU only; see
    gather_block_scores for the BlockSpec variant used in interpret mode).

    One grid step per query: all KB selected 128-row block slabs are
    async-copied from HBM into ONE contiguous VMEM scratch (double-buffered
    across queries, so query i+1's ~100 DMAs fly while query i computes),
    then scored with a single MXU dot. Compared to the BlockSpec variant
    this removes the per-group VMEM concat — which runs at byte granularity
    for int8 and costs more than the DMA itself — and deepens the DMA queue
    from one group (~34 copies) to the whole query (~100), hiding more of
    the per-copy latency of small (16-32 KB) random reads.

    Dequantisation scales do NOT ride DMA: they are block-uniform scalars
    (quantize_blocks layout), so the kernel emits raw masked int32-as-f32
    scores and the caller passes the [Qp, KB] per-selected-block scale
    matrix (phase B gathers it with the superblock one-hot it already
    builds — see _select_blocks), multiplied on afterwards in XLA. The
    per-block 512 B scale-row copies this replaces were HALF of all DMAs
    issued (all of them latency-bound). -inf masking survives the
    multiply exactly since scales are positive.

    Wide selections (IVF probes can select thousands of blocks per query)
    are processed in column chunks: the scalar-prefetched bidx lives in
    SMEM (~1 MB/core) and the double-buffered slab scratch in VMEM, both
    of which bound how many blocks one pallas_call can gather. Chunks pad
    only at the END of the padded-kb column range, so the caller's
    column -> bidx correspondence is preserved.

    q [Qp,D] (int8 when quantized else db dtype), db [Npad,D],
    tlen2d [NB,BLOCK] f32, qcap [Qp] f32, bidx [Qp,KB] i32 (-1 = padding),
    scale_sel [Qp,KB] f32 per-selected-block scales (quantized only).
    Returns scores [Qp, KB_padded*BLOCK] f32; masked/padded entries carry
    the finite NEG_CAP sentinel (use _topk_entries_capped to select and
    restore -inf)."""
    qp, d = q.shape
    nb = db.shape[0] // BLOCK
    # copies issued per loop iteration / scratch buffers (perf-tuning knobs;
    # see kernel note). NSLOTS > 2 issues DMAs for that many queries ahead.
    UNROLL = max(1, int(os.environ.get("MERIZO_GATHER_UNROLL", "8")))
    NSLOTS = max(2, int(os.environ.get("MERIZO_GATHER_SLOTS", "4")))
    kb = bidx.shape[1]
    nchunks, chunk = _gather_chunking(kb, qp, d, db.dtype.itemsize, UNROLL,
                                      NSLOTS)
    if nchunks > 1:
        kbp = nchunks * chunk
        bidx = jnp.pad(bidx, ((0, 0), (0, kbp - kb)), constant_values=-1)
        if scale_sel is not None:
            scale_sel = jnp.pad(scale_sel, ((0, 0), (0, kbp - kb)),
                                constant_values=1.0)
        pieces = [
            gather_block_scores_dma(
                q, db, tlen2d, qcap,
                jax.lax.slice_in_dim(bidx, c, c + chunk, axis=1),
                n_valid, use_len=use_len, quantized=quantized,
                scale_sel=None if scale_sel is None else
                jax.lax.slice_in_dim(scale_sel, c, c + chunk, axis=1))
            for c in range(0, kbp, chunk)
        ]
        return jnp.concatenate(pieces, axis=1)
    if kb % UNROLL:
        bidx = jnp.pad(bidx, ((0, 0), (0, UNROLL - kb % UNROLL)),
                       constant_values=-1)
        if scale_sel is not None:
            scale_sel = jnp.pad(scale_sel,
                                ((0, 0), (0, UNROLL - kb % UNROLL)),
                                constant_values=1.0)
        kb = bidx.shape[1]
    n_side = 1 if use_len else 0

    def kernel(bidx_ref, nv_ref, qcap_ref, bidxv_ref, q_ref, db_ref, *rest):
        side_refs = rest[:n_side]            # tlen2d / scales2d (HBM)
        out_ref = rest[n_side]
        scratch = rest[n_side + 1]           # [2, KB*BLOCK, D] db dtype
        side_s = rest[n_side + 2:n_side + 2 + n_side]  # [2, 1, KB*BLOCK] f32
        sem = rest[-1 - n_side] if n_side else rest[-1]
        side_sems = rest[len(rest) - n_side:] if n_side else ()
        i = pl.program_id(0)

        # NOTE: the copy loops are PARTIALLY unrolled (UNROLL copies per
        # dynamic fori iteration). Fully unrolling all ~100 async-copy
        # bodies made the host-side jaxpr->MLIR lowering of this kernel take
        # ~90 s per process (paid even on persistent-cache hits, which key
        # on the lowered module); a fully dynamic loop costs ~4 ms/batch of
        # scalar-core loop overhead. kb is padded to a multiple of UNROLL
        # (-1 columns are masked).
        def issue(qi, sl):
            def body(jj, _):
                for u in range(UNROLL):
                    j = jj * UNROLL + u
                    b = jnp.maximum(bidx_ref[qi, j], 0)
                    pltpu.make_async_copy(
                        db_ref.at[pl.ds(b * BLOCK, BLOCK), :],
                        scratch.at[sl, pl.ds(j * BLOCK, BLOCK), :],
                        sem.at[sl]).start()
                    for sx in range(n_side):
                        pltpu.make_async_copy(
                            side_refs[sx].at[pl.ds(b, 1), :],
                            side_s[sx].at[sl, :, pl.ds(j * BLOCK, BLOCK)],
                            side_sems[sx].at[sl]).start()
                return _
            jax.lax.fori_loop(0, kb // UNROLL, body, 0)

        @pl.when(i == 0)
        def _():
            for j in range(min(NSLOTS - 1, qp)):
                issue(j, j)

        @pl.when(i + NSLOTS - 1 < qp)
        def _():
            issue(i + NSLOTS - 1, (i + NSLOTS - 1) % NSLOTS)

        slot = i % NSLOTS

        def wait_body(jj, _):
            for u in range(UNROLL):
                pltpu.make_async_copy(
                    db_ref.at[pl.ds(0, BLOCK), :],
                    scratch.at[slot, pl.ds(0, BLOCK), :],
                    sem.at[slot]).wait()
                for sx in range(n_side):
                    pltpu.make_async_copy(
                        side_refs[sx].at[pl.ds(0, 1), :],
                        side_s[sx].at[slot, :, pl.ds(0, BLOCK)],
                        side_sems[sx].at[slot]).wait()
            return _
        jax.lax.fori_loop(0, kb // UNROLL, wait_body, 0)

        blocks = scratch[slot]                                   # [KB*BLOCK, D]
        rows = jax.lax.broadcasted_iota(jnp.int32, (q_ref.shape[0], 1), 0)
        if quantized:
            q_row = jnp.sum(jnp.where(rows == i, q_ref[:], 0).astype(jnp.int32),
                            axis=0, keepdims=True).astype(jnp.int8)
            s = jax.lax.dot_general(
                q_row, blocks, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        else:
            q_row = jnp.sum(jnp.where(rows == i, q_ref[:], 0).astype(jnp.float32),
                            axis=0, keepdims=True).astype(blocks.dtype)
            s = jax.lax.dot_general(
                q_row, blocks, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)              # [1, KB*BLOCK]
        # per-candidate db row id, vectorised from the VMEM copy of bidx
        # (a python concat of kb scalar-broadcast segments lowers ~3x slower)
        qrow = jnp.sum(jnp.where(rows == i, bidxv_ref[:], np.int32(0)),
                       axis=0)                                   # [KB]
        lane = jax.lax.broadcasted_iota(jnp.int32, (kb, BLOCK), 1)
        cols = (qrow[:, None] * BLOCK + lane).reshape(1, kb * BLOCK)
        mask = jnp.logical_and(cols >= 0, cols < nv_ref[0])      # bidx<0 = pad
        if use_len:
            mask = jnp.logical_and(mask, side_s[0][slot] <= qcap_ref[i])
        # masked entries get the FINITE NEG_CAP sentinel, not -inf: the
        # final select then runs the finite-domain cover directly with no
        # full-width isfinite clamp pass (callers restore -inf on output).
        # s == s also floors NaN scores from corrupt (NaN-embedding) DB rows
        # — the finite-domain select has no NaN guards of its own — fused
        # into the same select at zero extra memory traffic.
        out_ref[:] = jnp.where(jnp.logical_and(mask, s == s), s,
                               NEG_CAP).reshape(1, 1, kb * BLOCK)

    side_args, side_scratch, side_semst = [], [], []
    if use_len:
        side_args.append(tlen2d)
        side_scratch.append(pltpu.VMEM((NSLOTS, 1, kb * BLOCK), jnp.float32))
        side_semst.append(pltpu.SemaphoreType.DMA((NSLOTS,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(qp,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),        # bidx (VMEM)
                  pl.BlockSpec(memory_space=pltpu.VMEM)]        # q whole
                 + [pl.BlockSpec(memory_space=pltpu.ANY)] * (1 + n_side),
        out_specs=pl.BlockSpec((1, 1, kb * BLOCK), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((NSLOTS, kb * BLOCK, d), db.dtype),
                        *side_scratch,
                        pltpu.SemaphoreType.DMA((NSLOTS,)),
                        *side_semst],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((qp, 1, kb * BLOCK), jnp.float32),
        # the double-buffered scratch exceeds the default scoped-vmem budget
        # for wide gathers (IVF probes can select hundreds of blocks)
        compiler_params=_compiler_params(100 * 1024 * 1024),
    )(bidx, jnp.asarray([n_valid], jnp.int32), qcap, bidx, q, db, *side_args)
    out = out.reshape(qp, kb * BLOCK)
    if quantized:
        # dequantise only unmasked entries (fused into one elementwise pass
        # by XLA): the NEG_CAP sentinel must survive EXACTLY — a bare
        # multiply would rescale it by the block scale, breaking the
        # callers' restore threshold for very small or large scales
        o3 = out.reshape(qp, kb, BLOCK)
        out = jnp.where(o3 <= NEG_CAP, o3,
                        o3 * scale_sel[:, :, None]).reshape(qp, kb * BLOCK)
    return out


_G_CAP = int(os.environ.get("MERIZO_GATHER_G_CAP", "34"))  # perf-tuning knob


def _pick_gather_g(kb: int) -> int:
    """Blocks gathered per grid step: the g in [8, cap] minimising padded
    columns (ceil(kb/g)*g), ties to the larger g (deeper DMA pipelining)."""
    if kb <= _G_CAP:
        return kb
    best, best_cost = 8, 1 << 30
    for g in range(8, _G_CAP + 1):
        cost = -(-kb // g) * g
        if cost < best_cost or (cost == best_cost and g > best):
            best, best_cost = g, cost
    return best


@partial(jax.jit, static_argnames=("use_len", "interpret"))
def gather_block_scores(q, db, tlen2d, qcap, bidx, n_valid, use_len=False,
                        interpret=False, scales=None):
    """Phase C gather: recompute masked scores of selected DB blocks.

    q [Qp,D], db [Npad,D], tlen2d [NB,BLOCK] f32, qcap [Qp] f32,
    bidx [Qp,KB] i32 (-1 entries are padding),
    scales [Npad] f32 dequant scales for int8 DBs (else None) — block-uniform
    per 128-row block (`quantize_blocks` layout), read per-row here so the
    rescored values equal scale * int32-dot exactly.
    Returns scores [Qp, KB_padded*BLOCK] f32 with KB_padded = ceil(KB/g)*g;
    masked/padded entries carry the finite NEG_CAP sentinel (use
    _topk_entries_capped to select and restore -inf).

    The scalar-prefetched bidx drives the BlockSpec index maps, so Mosaic's
    pipeline DMAs exactly the selected 32 KB block slabs from HBM —
    a gather at near-streaming bandwidth instead of XLA's per-slice take.
    The g slabs are concatenated into one operand for a single MXU dot:
    per-slab small dots measure ~3x slower (each int8 dot pays an operand
    relayout that dwarfs the concat copy).

    int8 path: the dot runs natively int8 -> int32 on the MXU (casting the
    blocks to bf16 instead forces a (32,128)->(16,128) tiling relayout per
    step that costs more than the whole gather), so the recomputed integer
    dot equals phase A's int32 MXU result bit-for-bit before the scale
    multiply.
    """
    qp, d = q.shape
    nb = db.shape[0] // BLOCK
    kb = bidx.shape[1]
    g = _pick_gather_g(kb)
    kbp = -(-kb // g) * g
    if kbp != kb:
        bidx = jnp.pad(bidx, ((0, 0), (0, kbp - kb)), constant_values=-1)
        kb = kbp
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
        # finite NEG_CAP sentinel (see gather_block_scores_dma): callers run
        # the finite-domain select directly and restore -inf on output;
        # s == s floors NaN scores from corrupt DB rows
        s = jnp.where(jnp.logical_and(mask, s == s), s, NEG_CAP)
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


def _select_blocks(bm, sbm, n_valid, k, use_sb, sb_scale=None,
                   step_major=False):
    """Phase B: exact top-block selection from the kernel's maxima.

    bm [Qp, NSB, NBT] f32 (blockmax_scan's native 3-D layout), sbm
    [Qp, NSB] f32, sb_scale [NSB, NBT] f32 per-block dequant scales for
    int8 DBs (else None). Returns (bidx [Qp, KB] i32 global block ids,
    scale_sel [Qp, KB] f32 per-selected-block scales or None), with -1 /
    1.0 in padding slots and KB = min(k+1, NB) + 1.

    The scale gather rides phase B because the superblock one-hot is
    already built here: gathering the [NB]-wide per-block scale vector
    standalone costs ~110 MB of factorised one-hot traffic per 256-query
    batch, while reusing this one-hot against the tiny [NSB, NBT] scale
    matrix costs one extra small einsum (the phase-C rescore then needs
    no scale lookup at all).

    Superblock (= tile) maxima were computed in-kernel, so selection
    starts from SBM and never re-reduces the big BM matrix: pick the top
    superblocks (same cover argument one level up), gather their BM slabs
    with a one-hot MXU matmul (the only re-read of BM), then top blocks
    among those candidates. Chain of covers: a true top-k element's
    superblock must be selected (else enough superblocks each hold a
    larger element), and within the candidate set its block must be
    selected (same argument on block maxima). Row-validity: the kernel
    masks padding at block granularity only, so the block straddling
    n_valid may carry an inflated max. It can displace at most one true
    block (superblock) per level, so each level selects top-(k+1) and the
    straddling block is force-included (dedup'd to -1 if already
    selected, so no row is reported twice); phase C restores exact -inf
    for rows >= n_valid.

    The slab gather rides the MXU because alternatives measured worse:
    a kernel-managed DMA slab gather would move ~5x fewer bytes, but
    Mosaic rejects manual HBM memref_slice DMAs whose sublane extent
    isn't a multiple of the (8,128) tiling — a per-query slab is ONE
    sublane — and per-(q,slab) pipelined BlockSpec gathers are
    issue-rate-bound (~26k 1-KB copies/batch). The einsum contracts over
    the superblock dim, which blockmax_scan's 3-D BM layout keeps on
    sublanes, so XLA inserts no relayout (the flat [Qp, NB] layout paid a
    ~0.4 ms/batch relayout copy here at Q=256). BM is finite by
    construction (kernel clamps to -3.4e38) so no NaN guard is needed;
    dedup'd -1 rows match no one-hot column (slab of zeros) and are
    floored so they can never displace a real candidate.

    step_major=True declares bm in blockmax_scan's split layout
    [NSB, Qp, NBT] (BM[s, q, b]) — written by the kernel as one clean full
    block per grid step with no RMW; the slab gather then contracts s as
    the leading rhs dim ("qks,sqb->qkb"), still reading BM exactly once."""
    if step_major:
        nsb, qp, nbt = bm.shape
    else:
        qp, nsb, nbt = bm.shape
    nb = nsb * nbt
    straddle = jnp.minimum(jnp.asarray(n_valid, jnp.int32) // BLOCK, nb - 1)
    kb = min(k + 1, nb)
    if use_sb:
        ksb = min(k + 1, nsb)
        _, sbi = _topk_finite(sbm, ksb)                  # [Qp, ksb] tile ids
        ssb = straddle // nbt
        sbi = jnp.where(sbi == ssb, -1, sbi)             # dedup marker
        sbi = jnp.concatenate(
            [sbi, jnp.broadcast_to(ssb, (qp, 1))], axis=1)  # [Qp, ksb+1]
        onehot = (sbi[:, :, None] == np.arange(nsb)[None, None, :]
                  ).astype(jnp.float32)
        cand_bm = jnp.einsum("qks,sqb->qkb" if step_major else "qks,qsb->qkb",
                             onehot, bm,
                             preferred_element_type=jnp.float32,
                             precision=ONEHOT_PRECISION)
        cand_bm = jnp.where(sbi[:, :, None] < 0, NEG_CAP, cand_bm)
        _, bsel = _topk_finite(cand_bm.reshape(qp, (ksb + 1) * nbt), kb)
        # local candidate -> global block id arithmetically (gathered values
        # are superblock ids < 2^24, exact in the fp32 one-hot product);
        # candidates from dedup'd -1 slabs map to negative ids, which the
        # phase-C kernel masks to -inf.
        slot = bsel // nbt
        bidx = _gather_int(sbi, slot) * nbt + bsel % nbt
        bidx = jnp.where(bidx < 0, -1, bidx)
        if sb_scale is not None:
            # same one-hot, tiny RHS: cand slabs of the per-block scales
            cand_sc = jnp.einsum("qks,sb->qkb", onehot, sb_scale,
                                 preferred_element_type=jnp.float32,
                                 precision=ONEHOT_PRECISION)
            picked = _gather_subblocks(cand_sc, slot)    # [Qp, kb, nbt]
            lo_oh = (bsel[:, :, None] % nbt ==
                     np.arange(nbt)[None, None, :]).astype(jnp.float32)
            scale_sel = jnp.sum(picked * lo_oh, axis=2)  # [Qp, kb]
            scale_sel = jnp.where(bidx < 0, 1.0, scale_sel)
    else:
        if step_major:  # flat select needs [Qp, NB]; pays the relayout
            bm = bm.transpose(1, 0, 2)
        _, bidx = _topk_finite(bm.reshape(qp, nb), kb)   # [Qp, kb] block ids
        if sb_scale is not None:
            scale_sel = _gather_blockvec_f32(
                sb_scale.reshape(nb), jnp.maximum(bidx, 0))
    bidx = jnp.where(bidx == straddle, -1, bidx)         # dedup marker
    bidx = jnp.concatenate(
        [bidx, jnp.broadcast_to(straddle, (qp, 1))], axis=1)  # [Qp, kb+1]
    if sb_scale is None:
        return bidx, None
    # straddle column: one scalar scale shared by all queries; slots
    # dedup'd to -1 keep scale 1.0 (their scores are already -inf)
    st_sc = jax.lax.dynamic_index_in_dim(
        sb_scale.reshape(nb), straddle, keepdims=False)
    scale_sel = jnp.where(bidx[:, :kb] < 0, 1.0, scale_sel)
    scale_sel = jnp.concatenate(
        [scale_sel, jnp.broadcast_to(st_sc, (qp, 1))], axis=1)
    return bidx, scale_sel


def _bm_gather_kernel(nv_ref, sbidx_ref, q_ref, pvq_ref, pvbidx_ref, db_ref,
                      *rest, tile, nsteps, quantized, qt, sbw, nslab,
                      kbp, win, qp_prev, nslots):
    """Pipelined grid step: phase A over tile `i` of THIS batch fused with
    the phase-C gather of the PREVIOUS batch's selected blocks.

    STATUS — measured NEGATIVE result, kept as the documented experiment
    (tools/perf_pipelined.py reproduces it; results bit-exact vs the
    sequential fused_topk): at 16M rows on a v5e the fusion LOSES to the
    sequential three-phase dispatch — Q=64 bf16 6.47 vs 6.32 ms/batch,
    Q=256 bf16 10.5 vs 8.1 ms. Isolation (same kernel with a tiny
    prev-batch) shows the hand-rolled tile DMA pipeline exactly matches
    Mosaic's BlockSpec pipeline (6.18 vs 6.20 ms), and the loss scales
    with the number of gather windows: ~13 us of scalar-core work per
    previous-batch query (issuing + waiting kbp block copies inside the
    streaming kernel blocks the per-step pipeline) — 4x the per-copy cost
    the STANDALONE gather kernel pays, where Mosaic overlaps scalar issue
    with its own grid. Deeper prefetch (nslots 2 -> 4) changed nothing,
    confirming issue cost, not copy latency, binds. The sequential
    dispatch (fused_topk) therefore remains the production path; this
    kernel documents that the "overlap phase C with the next batch's
    phase A" design was built, validated for exactness, and measured
    slower on this hardware.

    The DB arrives via memory_space=ANY and is streamed with hand-rolled
    double-buffered DMA (tile i+1 in flight while tile i computes) — the
    same traffic BlockSpec pipelining would issue, but sharing one HBM
    array between streaming and the random-access block gather requires
    manual control.

    Gather scheduling: grid steps are split into windows of `win` steps;
    window j serves previous-batch query j — its kbp block copies are all
    issued at the window's first step and waited at its last, so every
    copy has (win-1) tile periods (~10 us each) to complete, and the
    per-query [1, D] x [D, kbp*BLOCK] rescore dot is trivial next to the
    tile matmul. The gather's bytes ride the SAME HBM stream as phase A:
    in the MXU-bound regime (large Q, int8) they are fully hidden; in the
    bandwidth-bound regime they extend phase A by exactly their streaming
    time. Either way the standalone phase-C dispatch — latency-bound small
    DMAs plus its own kernel walls — leaves the critical path.

    Selection/masking semantics match blockmax_scan (split BM layout,
    block-granular row validity) and gather_block_scores_dma (NEG_CAP
    sentinel, NaN floor, bidx < 0 padding). Length filtering (use_len) is
    NOT supported on this path — the sequential fused_topk handles mincov
    scans; the pipelined mode serves the unfiltered high-throughput case.

    sbidx (SMEM) and pvbidx (VMEM) are the SAME [qp_prev, kbp] array: DMA
    addresses must come from scalar (SMEM) loads, while the per-candidate
    column-id math wants a vector (VMEM) read.
    """
    if quantized:
        rs_ref = rest[0]
        rest = rest[1:]
    bm_ref, sbm_ref, pvs_ref = rest[0], rest[1], rest[2]
    tile_scr, gat_scr, tile_sem, gat_sem = rest[3], rest[4], rest[5], rest[6]

    i = pl.program_id(0)
    nbt = tile // BLOCK

    def start_tile(step, slot):
        pltpu.make_async_copy(
            db_ref.at[pl.ds(step * tile, tile), :],
            tile_scr.at[slot], tile_sem.at[slot]).start()

    @pl.when(i == 0)
    def _():
        start_tile(0, 0)

    @pl.when(i + 1 < nsteps)
    def _():
        start_tile(i + 1, (i + 1) % 2)

    # ---- previous-batch gather: issue nslots-1 windows AHEAD -------------
    # each query's kbp copies then have ~(nslots-1)*win tile periods to
    # complete; issuing only at the query's own window start left win-1
    # periods, which stalls every window when win is small (Q=256 ->
    # win=2: measured +2.3 ms/batch of gather-wait)
    active = i // win                              # previous-batch query id
    pos = i % win
    gslot = active % nslots

    def issue_gather(qi):
        sl = qi % nslots

        def body(jj, _):
            for u in range(8):                     # kbp is padded to 8
                j = jj * 8 + u
                b = jnp.maximum(sbidx_ref[qi, j], 0)
                pltpu.make_async_copy(
                    db_ref.at[pl.ds(b * BLOCK, BLOCK), :],
                    gat_scr.at[sl, pl.ds(j * BLOCK, BLOCK), :],
                    gat_sem.at[sl]).start()
            return _
        jax.lax.fori_loop(0, kbp // 8, body, 0)

    @pl.when(i == 0)
    def _():  # prologue: the first nslots-1 queries' copies
        for w in range(min(nslots - 1, qp_prev)):
            issue_gather(w)

    ahead = active + nslots - 1

    @pl.when((pos == 0) & (ahead < qp_prev))
    def _():
        issue_gather(ahead)

    # ---- phase A compute on the staged tile -------------------------------
    pltpu.make_async_copy(db_ref.at[pl.ds(0, tile), :],
                          tile_scr.at[i % 2], tile_sem.at[i % 2]).wait()
    gb = i * nbt + jax.lax.broadcasted_iota(jnp.int32, (1, nbt), 1)
    blk_valid = gb * BLOCK < nv_ref[0]
    nqt = q_ref.shape[0] // qt
    slab = tile // nslab
    nbt_s = slab // BLOCK
    for j in range(nqt):                            # static unroll
        qtile = q_ref[j * qt:(j + 1) * qt, :]
        parts = []
        for r in range(nslab):                      # static unroll
            sub = tile_scr[i % 2, r * slab:(r + 1) * slab, :]
            if quantized:
                s = jax.lax.dot_general(
                    sub, qtile,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                parts.append(jnp.max(s.reshape(nbt_s, BLOCK, qt), axis=1)
                             .astype(jnp.float32)
                             * rs_ref[r * nbt_s:(r + 1) * nbt_s, 0:1])
            else:
                s = jax.lax.dot_general(
                    sub, qtile,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                parts.append(jnp.max(s.reshape(nbt_s, BLOCK, qt), axis=1))
        bmt = jnp.concatenate(parts, axis=0).T      # [qt, nbt]
        bmt = jnp.where(blk_valid, jnp.maximum(bmt, NEG_CAP), NEG_CAP)
        bm_ref[0, j * qt:(j + 1) * qt, :] = bmt     # step-major split layout
        sb_lane = jax.lax.broadcasted_iota(jnp.int32, (1, sbw), 1)
        col = i % sbw
        contrib = jnp.where(sb_lane == col,
                            jnp.max(bmt, axis=1, keepdims=True),
                            float("-inf"))
        cur = sbm_ref[j * qt:(j + 1) * qt, :]
        sbm_ref[j * qt:(j + 1) * qt, :] = jnp.where(
            col == 0, contrib, jnp.maximum(cur, contrib))

    # ---- previous-batch rescore at the window's last step -----------------
    # (every real window [j*win, (j+1)*win) is complete because
    # win = nsteps // qp_prev; trailing steps have active >= qp_prev and do
    # nothing, so each gat_sem signal is consumed exactly once)
    @pl.when((pos == win - 1) & (active < qp_prev))
    def _():
        def wait_body(jj, _):
            for u in range(8):
                pltpu.make_async_copy(
                    db_ref.at[pl.ds(0, BLOCK), :],
                    gat_scr.at[gslot, pl.ds(0, BLOCK), :],
                    gat_sem.at[gslot]).wait()
            return _
        jax.lax.fori_loop(0, kbp // 8, wait_body, 0)
        blocks = gat_scr[gslot]                     # [kbp*BLOCK, D]
        rows = jax.lax.broadcasted_iota(jnp.int32, (pvq_ref.shape[0], 1), 0)
        if quantized:
            q_row = jnp.sum(jnp.where(rows == active, pvq_ref[:], 0)
                            .astype(jnp.int32), axis=0,
                            keepdims=True).astype(jnp.int8)
            s = jax.lax.dot_general(
                q_row, blocks, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        else:
            q_row = jnp.sum(jnp.where(rows == active, pvq_ref[:], 0)
                            .astype(jnp.float32), axis=0,
                            keepdims=True).astype(blocks.dtype)
            s = jax.lax.dot_general(
                q_row, blocks, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [1, kbp*BLOCK]
        qrow = jnp.sum(jnp.where(rows == active, pvbidx_ref[:],
                                 np.int32(0)), axis=0)            # [kbp]
        lane = jax.lax.broadcasted_iota(jnp.int32, (kbp, BLOCK), 1)
        cols = (qrow[:, None] * BLOCK + lane).reshape(1, kbp * BLOCK)
        mask = jnp.logical_and(cols >= 0, cols < nv_ref[0])
        pvs_ref[:] = jnp.where(jnp.logical_and(mask, s == s), s,
                               NEG_CAP).reshape(1, 1, kbp * BLOCK)


def blockmax_scan_gather(q, db, n_valid, pv_q, pv_bidx,
                         tile=DEFAULT_TILE, scales=None):
    """Fused phase A (this batch) + phase C gather (previous batch).

    q [Qp, D] this batch's queries (db dtype), pv_q [Qp_prev, D] previous
    batch's queries, pv_bidx [Qp_prev, KB] i32 previous batch's selected
    block ids (-1 padding; phase B output). Requires npad//tile >=
    Qp_prev (one grid window per previous query) — fused_topk_step falls
    back to the sequential path otherwise.

    Returns (BM step-major [NSB, Qp, NBT], SBM [Qp, NSB],
    prev_scores [Qp_prev, KBp*BLOCK], KBp = KB padded to 8; NEG_CAP
    sentinel in masked slots). TPU-only (manual DMA, no interpret mode);
    exactness is pinned against fused_topk by the live-chip pipelined test.
    """
    qn, d = q.shape
    npad = db.shape[0]
    quantized = scales is not None
    qt = min(-(-qn // 8) * 8, QTILE)
    qp = -(-qn // qt) * qt
    if qp != qn:
        q = jnp.pad(q, ((0, qp - qn), (0, 0)))
    nsteps = npad // tile
    qp_prev, kb = pv_bidx.shape
    kbp = -(-kb // 8) * 8
    if kbp != kb:
        pv_bidx = jnp.pad(pv_bidx, ((0, 0), (0, kbp - kb)),
                          constant_values=-1)
    if nsteps < qp_prev:
        raise ValueError(f"pipelined scan needs nsteps >= prev queries "
                         f"({nsteps} < {qp_prev})")
    win = nsteps // qp_prev
    sbw = 128 if nsteps % 128 == 0 else nsteps
    nslab = max(0, int(os.environ.get("MERIZO_NSLAB", "0"))
                ) or (4 if quantized else 2)
    while tile // nslab < BLOCK or (tile // nslab) % BLOCK:
        nslab //= 2
    nbt = tile // BLOCK
    nb = npad // BLOCK

    nslots = max(2, int(os.environ.get("MERIZO_PIPE_SLOTS", "4")))
    kernel = partial(_bm_gather_kernel, tile=tile, nsteps=nsteps,
                     quantized=quantized, qt=qt, sbw=sbw, nslab=nslab,
                     kbp=kbp, win=win, qp_prev=qp_prev, nslots=nslots)
    pv_bidx = pv_bidx.astype(jnp.int32)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                 # n_valid
        pl.BlockSpec(memory_space=pltpu.SMEM),                 # bidx (scalar)
        pl.BlockSpec(memory_space=pltpu.VMEM),                 # q (whole)
        pl.BlockSpec(memory_space=pltpu.VMEM),                 # pv_q
        pl.BlockSpec(memory_space=pltpu.VMEM),                 # pv_bidx (vec)
        pl.BlockSpec(memory_space=pltpu.ANY),                  # db (manual)
    ]
    args = [jnp.asarray([n_valid], jnp.int32), pv_bidx, q, pv_q, pv_bidx, db]
    if quantized:
        in_specs.append(pl.BlockSpec((nbt, BLOCK), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(scales.reshape(nb, BLOCK))

    scratch = [
        pltpu.VMEM((2, tile, d), db.dtype),                    # tile slabs
        pltpu.VMEM((nslots, kbp * BLOCK, d), db.dtype),        # gather slabs
        pltpu.SemaphoreType.DMA((2,)),                         # tile sem
        pltpu.SemaphoreType.DMA((nslots,)),                    # gather sem
    ]
    bm, sbm, pvs = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, qp, nbt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qp, sbw), lambda i: (0, i // sbw),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kbp * BLOCK),
                         lambda i: (jnp.minimum(i // win, qp_prev - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nsteps, qp, nbt), jnp.float32),
            jax.ShapeDtypeStruct((qp, nsteps), jnp.float32),
            jax.ShapeDtypeStruct((qp_prev, 1, kbp * BLOCK), jnp.float32),
        ),
        scratch_shapes=scratch,
        compiler_params=_compiler_params(110 * 1024 * 1024),
    )(*args)
    if qp != qn:
        bm = bm[:, :qn]
        sbm = sbm[:qn]
    return bm, sbm, pvs.reshape(qp_prev, kbp * BLOCK)


@partial(jax.jit, static_argnames=("k", "tile"))
def fused_topk_step(q, db, n_valid, k, carry, tile=DEFAULT_TILE,
                    scales=None):
    """One step of the two-batch pipelined exact scan (EXPERIMENTAL — see
    _bm_gather_kernel's STATUS note: measured slower than the sequential
    fused_topk on a v5e; kept as the validated, bit-exact record of the
    dispatch-overlap experiment, not used by the engine or bench).

    Runs batch i's phase A fused with batch i-1's phase-C gather in ONE
    kernel pass over the DB, then batch i's phase B and batch i-1's final
    select as small XLA segments.

    carry: None on the first call (its returned results are all
    -inf / -1 — there is no previous batch), else the carry returned by
    the previous call. Batch size must stay constant across calls. No
    length filtering here (use fused_topk for mincov scans).

    Returns ((v [Q,k] f32, idx [Q,k] i32) for the PREVIOUS batch,
    new_carry). Re-invoke with the next batch (or once more with any
    batch) to drain the last results. Per-batch results are identical to
    fused_topk: same kernel arithmetic, same selection logic.
    """
    qn, d = q.shape
    npad = db.shape[0]
    sub = 16 if q.dtype == jnp.bfloat16 else (32 if q.dtype == jnp.int8 else 8)
    qp = ((qn + sub - 1) // sub) * sub
    if qp != qn:
        q = jnp.pad(q, ((0, qp - qn), (0, 0)))
    nsb_ = npad // tile
    nb = npad // BLOCK
    sb_scale = (None if scales is None
                else scales.reshape(nb, BLOCK)[:, 0].reshape(nsb_,
                                                             tile // BLOCK))
    if carry is None:
        kb0 = min(k + 1, nb) + 1
        carry = {
            "q": jnp.zeros((qp, d), q.dtype),
            "bidx": jnp.full((qp, kb0), -1, jnp.int32),
            "scale_sel": (jnp.ones((qp, kb0), jnp.float32)
                          if scales is not None else None),
        }
    bm, sbm, pvs = blockmax_scan_gather(q, db, n_valid, carry["q"],
                                        carry["bidx"], tile=tile,
                                        scales=scales)
    use_sb = nsb_ >= 2 * min(k + 1, nsb_) and nsb_ >= 2
    if not use_sb:
        raise ValueError("pipelined scan needs the superblock regime "
                         "(npad//tile >= 2k); use fused_topk")
    bidx, scale_sel = _select_blocks(bm, sbm, n_valid, k, True,
                                     sb_scale=sb_scale, step_major=True)
    # previous batch's final select from the fused gather's scores
    if scales is not None and carry["scale_sel"] is not None:
        kbp = pvs.shape[1] // BLOCK
        ssel = carry["scale_sel"]
        if ssel.shape[1] != kbp:
            ssel = jnp.pad(ssel, ((0, 0), (0, kbp - ssel.shape[1])),
                           constant_values=1.0)
        o3 = pvs.reshape(qp, kbp, BLOCK)
        pvs = jnp.where(o3 <= NEG_CAP, o3,
                        o3 * ssel[:, :, None]).reshape(qp, kbp * BLOCK)
    v, sel = _topk_entries_capped(pvs, k)
    pb = carry["bidx"]
    if pvs.shape[1] // BLOCK != pb.shape[1]:
        pb = jnp.pad(pb, ((0, 0), (0, pvs.shape[1] // BLOCK - pb.shape[1])),
                     constant_values=-1)
    idx = _gather_int(pb, sel // BLOCK) * BLOCK + sel % BLOCK
    idx = jnp.where(jnp.isfinite(v), idx, -1).astype(jnp.int32)
    if bidx.shape[0] != qp:  # pad selection rows back to the padded batch
        bidx = jnp.pad(bidx, ((0, qp - bidx.shape[0]), (0, 0)),
                       constant_values=-1)
        if scale_sel is not None:
            scale_sel = jnp.pad(scale_sel,
                                ((0, qp - scale_sel.shape[0]), (0, 0)),
                                constant_values=1.0)
    new_carry = {"q": q, "bidx": bidx,
                 "scale_sel": scale_sel if scales is not None else None}
    return (v[:qn], idx[:qn]), new_carry


@partial(jax.jit, static_argnames=("k", "tile", "use_len", "interpret"))
def fused_topk(q, db, n_valid, k, tlen=None, qlen=None, mincov=0.0,
               tile=DEFAULT_TILE, use_len=False, interpret=False,
               scales=None):
    """Exact top-k inner-product search with the fused Pallas scan.

    q    [Q, D]  queries, same dtype as db (bf16 on the production path)
    db   [Npad, D], Npad % tile == 0, rows >= n_valid are padding
    scales [Npad] f32: dequant scales when db is int8-quantised. MUST be
        block-uniform — one shared scale per 128 consecutive rows, the
        `quantize_blocks` layout (per-row `quantize_rows` output silently
        corrupts phase B's block maxima; see blockmax_scan). The int8 scan
        halves HBM traffic and uses the 2x-rate int8 MXU path; results are
        the exact top-k of the *quantised* scores. Quantisation error: the
        shared scale is set by the largest |entry| in the 128-row block, so
        the per-entry step is max|block| / 127 — a few times the per-row
        step when row norms vary within a block (recall vs the f32 scan is
        measured in tests/test_pallas_scan.py::test_int8_block_scale_recall).
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
        tl = tlen * jnp.asarray(mincov, jnp.float32)
        qcap = jnp.pad(qlen, (0, qp - qn)) if qp != qn else qlen
    else:
        # symbolic (tracer-derived) fills: a plain jnp.zeros/full here runs
        # EAGERLY during tracing, materialises an npad-sized device array,
        # and the lowering-time constant fetch of it through the remote
        # tunnel costs minutes per process
        tl = (tlen if tlen is not None
              else jnp.zeros_like(db, shape=(npad,), dtype=jnp.float32))
        qcap = jnp.full_like(q, np.float32(np.inf), shape=(qp,),
                             dtype=jnp.float32)

    # Phase A: block maxima at HBM bandwidth
    nsb_ = npad // tile
    use_sb = nsb_ >= 2 * min(k + 1, nsb_) and nsb_ >= 2
    bm, sbm = blockmax_scan(q, db, n_valid, tl, qcap, tile=tile,
                            use_len=use_len, interpret=interpret,
                            scales=scales, allow_split=use_sb)

    nb = npad // BLOCK
    sb_scale = (None if scales is None
                else scales.reshape(nb, BLOCK)[:, 0].reshape(nsb_,
                                                             tile // BLOCK))
    # blockmax_scan returns the step-major split BM exactly when allow_split
    # was passed and the grid had >1 step (nsb_ >= 2 is implied by use_sb)
    bidx, scale_sel = _select_blocks(bm, sbm, n_valid, k, use_sb,
                                     sb_scale=sb_scale,
                                     step_major=use_sb and nsb_ > 1)

    # Phase C: recompute masked scores of only the selected blocks (Pallas
    # gather at streaming bandwidth) and take the final exact top-k. The
    # kernel-managed-DMA gather is the production path; the BlockSpec
    # variant backs interpret mode (manual DMA is TPU-only).
    qc = q  # int8 queries stay int8: the gather kernel runs the native int8 MXU dot
    if interpret:
        scores = gather_block_scores(qc, db, tl.reshape(nb, BLOCK), qcap, bidx,
                                     n_valid, use_len=use_len,
                                     interpret=interpret, scales=scales)
    else:
        scores = gather_block_scores_dma(
            qc, db, tl.reshape(nb, BLOCK), qcap, bidx, n_valid,
            use_len=use_len, quantized=scales is not None,
            scale_sel=scale_sel)
    kbp = scores.shape[1] // BLOCK
    if kbp != bidx.shape[1]:  # the gather pads bidx columns to its group size
        bidx = jnp.pad(bidx, ((0, 0), (0, kbp - bidx.shape[1])),
                       constant_values=-1)
    v, sel = _topk_entries_capped(scores, k)
    # candidate slot -> db row arithmetically: gather only block ids
    # (< 2^24, exact in the fp32 one-hot product) and rebuild the row id
    # in int32 — a take_along_axis here costs ~0.26 ms in scalar gathers
    idx = _gather_int(bidx, sel // BLOCK) * BLOCK + sel % BLOCK
    idx = jnp.where(jnp.isfinite(v), idx, -1)
    return v[:qn], idx[:qn].astype(jnp.int32)
