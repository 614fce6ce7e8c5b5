"""Pure-function helpers of the fused scan (ops/pallas_scan.py): the
column-chunking policy of the DMA gather and the factoriser behind the
two-level one-hot gathers. These encode hardware budgets (SMEM scalar
prefetch, VMEM slab scratch) as arithmetic, so they are cheap to pin
exhaustively on CPU."""

import numpy as np
import pytest

from merizo_search_tpu.ops.pallas_scan import (
    BLOCK, _best_factor, _gather_chunking, _pick_gather_g)


# ---- _gather_chunking -------------------------------------------------------

def test_chunking_small_kb_single_call():
    nchunks, chunk = _gather_chunking(kb=102, qp=256, d=128, itemsize=2,
                                      unroll=25)
    assert nchunks == 1 and chunk == 102


def test_chunking_wide_kb_splits_balanced():
    # IVF probes can select thousands of blocks per query
    kb, qp, d, itemsize, unroll = 5000, 256, 128, 4, 25
    nchunks, chunk = _gather_chunking(kb, qp, d, itemsize, unroll)
    assert nchunks > 1
    assert chunk % unroll == 0
    # chunks must cover kb
    assert nchunks * chunk >= kb
    # balanced: one fewer chunk must NOT suffice at this width
    assert (nchunks - 1) * chunk < kb
    # each chunk respects both budgets
    smem_cols = (512 * 1024 // (4 * qp)) // unroll * unroll
    vmem_cols = (64 * 1024 * 1024 // (2 * BLOCK * d * itemsize)) \
        // unroll * unroll
    assert chunk <= max(unroll, min(smem_cols, vmem_cols))


@pytest.mark.parametrize("qp", [8, 64, 256, 512])
@pytest.mark.parametrize("itemsize", [1, 2, 4])
def test_chunking_invariants_across_shapes(qp, itemsize):
    for kb in (1, 25, 101, 1024, 9973):
        nchunks, chunk = _gather_chunking(kb, qp, 128, itemsize, 25)
        assert nchunks >= 1 and chunk >= 1
        assert nchunks * chunk >= kb
        if nchunks > 1:
            assert chunk % 25 == 0


# ---- _best_factor -----------------------------------------------------------

def test_best_factor_prefers_small_b():
    # n = a*b with the SMALLEST b such that b*lanes >= 128
    a = _best_factor(1024, lanes=1)
    assert a > 1 and 1024 % a == 0
    b = 1024 // a
    assert b >= 128           # one full lane tile
    assert b < 2 * 128        # smallest such divisor for a power of two


def test_best_factor_lanes_scale_target():
    # lanes=8: b only needs to reach 16 columns of 8 lanes
    a = _best_factor(1024, lanes=8)
    b = 1024 // a
    assert b * 8 >= 128
    assert b < 2 * 16


def test_best_factor_prime_falls_back_flat():
    assert _best_factor(9973, lanes=1) == 1  # prime: no divisor


def test_best_factor_respects_cap():
    a = _best_factor(1 << 20, lanes=1, cap=8192)
    assert a <= 8192
    assert (1 << 20) % a == 0


# ---- _pick_gather_g ---------------------------------------------------------

def test_pick_gather_g_divides_padding_minimally():
    for kb in (1, 26, 50, 101, 102, 1000):
        g = _pick_gather_g(kb)
        assert g >= 1
        padded = -(-kb // g) * g
        # never more than one group of padding
        assert padded - kb < g
