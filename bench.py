"""Benchmark: all five BASELINE configs on the live TPU, one JSON line.

Headline (config 2): exact flat cosine top-100 over a synthetic
16,777,216 x 128 DB resident in HBM — the scan that replaces the
reference's faiss IndexFlat block loop (dbsearch.py:213-248). Also
reported, inside the same JSON line under "configs":

  cath_exact      config 1 — CATH-4.3-scale (2^19 rows) resident scan qps
  flat_scan_16M   config 2 — bf16 + int8 qps, GB/s-equiv, SoL fractions
  segment_forward config 3 — Merizo forward ms at 272/432/775 residues
  createdb_embed  config 4 — Foldclass embedding throughput (structs/s)
  ted_stream      config 5 — larger-than-HBM streaming scan over an
                  on-disk int8-sidecar DB (host-read-bound; roofline stated)
  easy_search_e2e config 6 — whole-pipeline easy-search (segment -> embed ->
                  scan -> TM-align -> writers) s/structure on the reference
                  example PDBs vs a CATH-toy-scale DB (BASELINE rows 1-3)

Speed-of-light accounting for config 2 (v5e: 819 GB/s HBM, ~197 TFLOP/s
bf16, ~394 TOP/s int8): at Q=256 the bf16 scan is MXU-compute-bound
(t_flops ~ 5.4 ms > t_hbm ~ 5.2 ms for 4.3 GB), so SoL fraction =
t_sol / t_measured with t_sol = max(bytes/819e9, flops/197e12). The exact
k=100 pipeline additionally re-reads ~100 128-row blocks per query for the
phase-C rescore (~0.8 GB/batch at bf16) — counted in the stated floor.

Measurement: the TPU sits behind a tunnel with ~30 ms round-trip and
multi-ms jitter, so timings use async dispatch pipelining (rep calls
dispatched back-to-back, one block at the end) minus a separately-measured
per-dispatch overhead — no RTT subtraction.

Prints ONE JSON line:
  {"metric": ..., "value": qps, "unit": "queries/s", "vs_baseline": ratio,
   "sol_fraction": ..., "configs": {...}}
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

DB_N = 1 << 24          # 16,777,216 vectors (4 GB bf16 resident in HBM)
DIM = 128
N_QUERIES = 256
K = 100

HBM_GBPS = 819e9        # v5e nominal
BF16_FLOPS = 197e12
INT8_OPS = 394e12

STREAM_LOGN = int(os.environ.get("MERIZO_BENCH_STREAM_LOGN", "23"))  # 8.4M
CACHE_ROOT = os.environ.get(
    "MERIZO_TPU_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "merizo_tpu"))


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def _sol_seconds(n, q, bytes_per_elem, peak_ops):
    t_hbm = n * DIM * bytes_per_elem / HBM_GBPS
    t_mxu = 2.0 * n * q * DIM / peak_ops
    return max(t_hbm, t_mxu)


def tpu_benchmarks(configs):
    import jax
    import jax.numpy as jnp

    from _bench_util import bench
    from merizo_search_tpu.ops.pallas_scan import fused_topk

    kq, kd = jax.random.split(jax.random.PRNGKey(0))
    db = jax.jit(lambda k: jax.random.normal(k, (DB_N, DIM), jnp.bfloat16))(kd)
    q0 = jax.random.normal(kq, (N_QUERIES, DIM), jnp.float32)
    q0 = (q0 / jnp.linalg.norm(q0, axis=1, keepdims=True)).astype(db.dtype)

    def scan_fn(i, q0, db, *s):
        q = q0 * (1.0 + i.astype(db.dtype) * db.dtype.type(1e-3)) \
            if db.dtype != jnp.int8 else q0 + (i % 3).astype(jnp.int8)
        v, idx = fused_topk(q, db, db.shape[0], K,
                            scales=(s[0] if s else None))
        return jnp.sum(v) + jnp.sum(idx[:, 0].astype(jnp.float32))

    # measured HBM-read ceiling: a fused multiply-reduce that reads every DB
    # byte once and writes one scalar, timed with the SAME harness as the
    # scan. Nominal SoL (819 GB/s spec) and harness timing share any
    # calibration bias; the scan-vs-probe ratio cancels it, so
    # "sol_fraction_vs_measured_read" is the calibration-independent figure
    # (a probe itself >100% of spec indicates harness undercount, flagged
    # below rather than silently clamped).
    def read_probe(i, db):
        w = (1.0 + i.astype(jnp.float32) * 1e-3).astype(db.dtype)
        return jnp.sum((db * w).astype(jnp.float32))

    t_read = bench(read_probe, db, rep=5, inner=8)
    read_gbps = DB_N * DIM * 2 / t_read / 1e9
    # Pallas grid-pipelined read probe (tools/perf_hbm.py): streams wide
    # [tile, 1024] blocks HBM->VMEM with no compute. Measured 767 GB/s
    # (93.7% of the 819 spec) vs the fused-reduce probe's ~624 — the reduce
    # probe under-reports the DMA ceiling, so 'measured' takes the max.
    try:
        from perf_hbm import stream_probe

        dbw = db.reshape(DB_N // 8, DIM * 8)

        def pallas_read(i, x):
            return jnp.sum(stream_probe(x, i.astype(jnp.float32), 4096))

        t_pread = bench(pallas_read, dbw, rep=5, inner=8)
        read_gbps = max(read_gbps, DB_N * DIM * 2 / t_pread / 1e9)
    except Exception as e:  # keep the bench alive on probe regressions
        print(f"# pallas read probe failed: {e}", file=sys.stderr)

    # ---- config 2: 16M flat scan, bf16 + int8 -----------------------------
    t_bf = bench(scan_fn, q0, db, rep=5, inner=8)
    db8 = jax.jit(lambda d: jnp.clip(d * jnp.bfloat16(40), -127, 127)
                  .astype(jnp.int8))(db)
    rs8 = jnp.full((DB_N,), jnp.float32(1 / 40.0))
    q8 = jnp.asarray(np.clip(np.asarray(q0, np.float32) * 124,
                             -124, 124).astype(np.int8))
    t_i8 = bench(scan_fn, q8, db8, rs8, rep=5, inner=8)

    # regime sweep: Q=64 is HBM-bandwidth-bound (t_mxu ~ 1.4 ms < t_hbm ~
    # 5.2 ms for bf16) — the regime BASELINE's "% of speed-of-light
    # flat-scan" language describes; Q=512 is the saturated-throughput
    # serving point (MXU-bound, best qps).
    t_bf64 = bench(scan_fn, q0[:64], db, rep=5, inner=8)
    sol_bf64 = _sol_seconds(DB_N, 64, 2, BF16_FLOPS)
    t_bf512 = bench(scan_fn, jnp.concatenate([q0, -q0]), db, rep=4, inner=6)
    q8_512 = jnp.concatenate([q8, -q8])
    t_i8512 = bench(scan_fn, q8_512, db8, rs8, rep=4, inner=6)

    sol_bf = _sol_seconds(DB_N, N_QUERIES, 2, BF16_FLOPS)
    sol_i8 = _sol_seconds(DB_N, N_QUERIES, 1, INT8_OPS)
    qps = N_QUERIES / t_bf
    configs["flat_scan_16M"] = {
        "bf16_ms_per_batch": round(t_bf * 1e3, 2),
        "bf16_qps": round(qps, 0),
        "bf16_GBps_equiv": round(DB_N * DIM * 2 / t_bf / 1e9, 0),
        "bf16_sol_fraction": round(sol_bf / t_bf, 3),
        "int8_ms_per_batch": round(t_i8 * 1e3, 2),
        "int8_qps": round(N_QUERIES / t_i8, 0),
        "int8_sol_fraction": round(sol_i8 / t_i8, 3),
        "int8_vs_bf16_qps": round(t_bf / t_i8, 2),
        "measured_hbm_read_GBps": round(read_gbps, 0),
        "hbm_probe_note": (
            "max of two probes over the same DB, timed identically: a fused "
            "multiply-reduce and a Pallas grid-pipelined stream (the latter "
            "reaches ~94% of the 819 GB/s spec, settling the achievable "
            "ceiling); sol_fraction_vs_measured_read divides by this, "
            "cancelling any harness calibration bias"
            + (" — PROBE EXCEEDS SPEC: absolute timings undercount, trust "
               "the vs_measured ratios" if read_gbps > 840 else "")),
        "bandwidth_bound_q64": {
            "bf16_ms_per_batch": round(t_bf64 * 1e3, 2),
            "bf16_sol_fraction": round(sol_bf64 / t_bf64, 3),
            "sol_fraction_vs_measured_read": round(t_read / t_bf64, 3),
            "note": "Q=64 keeps the scan HBM-bound (t_mxu < t_hbm): the "
                    "regime BASELINE's speed-of-light flat-scan target "
                    "describes",
        },
        "saturated_q512": {
            "bf16_qps": round(512 / t_bf512, 0),
            "int8_qps": round(512 / t_i8512, 0),
            "int8_vs_bf16_qps": round(t_bf512 / t_i8512, 2),
            "bf16_sol_fraction": round(
                _sol_seconds(DB_N, 512, 2, BF16_FLOPS) / t_bf512, 3),
            "int8_sol_fraction": round(
                _sol_seconds(DB_N, 512, 1, INT8_OPS) / t_i8512, 3),
        },
        "sol_note": "SoL = max(HBM read, MXU flops) of the pure scan; the "
                    "exact k=100 cover pipeline also writes/reads 128 MB of "
                    "block maxima and regathers ~0.85 GB (bf16) of selected "
                    "blocks for the exact rescore, which SoL excludes",
    }

    # recall sanity: exact selection must match fp32 brute force. The
    # reference ranking is computed ON DEVICE — device->host readback
    # through this tunnel runs at ~0.2 MB/s, so fetching a 67 MB DB slice
    # for a numpy brute force silently cost ~5 minutes; only the [Q,K]
    # rankings come back.
    sl = 1 << 17

    @jax.jit
    def _brute_ref(q, dbs):
        s = jnp.dot(q.astype(jnp.float32), dbs.astype(jnp.float32).T,
                    precision=jax.lax.Precision.HIGHEST)
        vals, idx = jax.lax.top_k(s, K)
        return vals, idx

    ref_v, ref_i = _brute_ref(q0, db[:sl])
    vv, ii = fused_topk(q0, db[:sl], sl, K, tile=8192)
    ref_v, ref_i, ii = (np.asarray(x) for x in (ref_v, ref_i, ii))
    ref_kth = ref_v[:, -1]
    rec = np.mean([
        len(set(ii[r]) & set(ref_i[r][ref_v[r] > ref_kth[r] + 1e-5])) /
        max(1, len(ref_i[r][ref_v[r] > ref_kth[r] + 1e-5]))
        for r in range(N_QUERIES)])
    configs["flat_scan_16M"]["recall_at_100"] = round(float(rec), 4)
    # int8 recall vs the same f32 brute-force ranking: the int8 scan is the
    # exact top-k of the QUANTISED scores, so this measures what the 8-bit
    # representation costs in ranking fidelity (clear-margin definition as
    # above, so bf16-vs-f32 tie noise in the reference ranking itself does
    # not contaminate the figure)
    vv8, ii8 = fused_topk(q8, db8[:sl], sl, K, tile=8192, scales=rs8[:sl])
    ii8 = np.asarray(ii8)
    rec8 = np.mean([
        len(set(ii8[r]) & set(ref_i[r][ref_v[r] > ref_kth[r] + 1e-5])) /
        max(1, len(ref_i[r][ref_v[r] > ref_kth[r] + 1e-5]))
        for r in range(N_QUERIES)])
    configs["flat_scan_16M"]["int8_recall_at_100"] = round(float(rec8), 4)
    print(f"# 16M scan: bf16 {t_bf*1e3:.2f} ms/batch ({qps:.0f} q/s, "
          f"{sol_bf/t_bf*100:.0f}% SoL), int8 {t_i8*1e3:.2f} ms "
          f"({t_bf/t_i8:.2f}x), recall@100={rec:.4f}", file=sys.stderr)
    print(f"# 16M scan regimes: Q=64 bf16 {t_bf64*1e3:.2f} ms "
          f"({sol_bf64/t_bf64*100:.0f}% of HBM SoL); Q=512 "
          f"{512/t_bf512:.0f} bf16 / {512/t_i8512:.0f} int8 q/s "
          f"({t_bf512/t_i8512:.2f}x)", file=sys.stderr)

    # ---- config 1: CATH-4.3 scale (~500k rows) ----------------------------
    n_cath = 1 << 19
    dbc = db[:n_cath]
    t_c = bench(scan_fn, q0, dbc, rep=5, inner=32)
    configs["cath_exact"] = {
        "rows": n_cath, "bf16_ms_per_batch": round(t_c * 1e3, 3),
        "bf16_qps": round(N_QUERIES / t_c, 0),
        "note": "device-resident bf16 exact scan at CATH-4.3 scale",
    }
    print(f"# CATH-scale scan: {t_c*1e3:.2f} ms/batch "
          f"({N_QUERIES/t_c:.0f} q/s)", file=sys.stderr)

    # ---- config 3: Merizo segment forwards --------------------------------
    from merizo_search_tpu.models.merizo import network as mznet
    from merizo_search_tpu.utils.bucketing import bucket_for

    params = jax.jit(mznet.init_params)(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    fwd = jax.jit(mznet.forward_features)
    ref_ms = {272: 252, 432: 396, 775: 717}
    seg = {}
    for nres in (272, 432, 775):
        n = bucket_for(nres)
        sfeat = jnp.asarray(rng.normal(size=(1, n, 20)).astype(np.float32))
        coords = np.cumsum(rng.normal(size=(n, 3)) * 2.0, axis=0)
        dmat = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
        z = jnp.asarray(dmat.reshape(1, n, n, 1).astype(np.float32))
        r = jnp.asarray(np.broadcast_to(
            np.eye(3, dtype=np.float32), (1, n, 3, 3)).copy())
        t_ = jnp.asarray(coords.reshape(1, n, 3).astype(np.float32))
        ri = jnp.asarray(np.arange(n, dtype=np.float32).reshape(1, n))
        mask = np.ones((1, n), np.float32)
        mask[:, nres:] = 0.0
        mask = jnp.asarray(mask)

        def seg_fn(i, params, sfeat, z, r, t_, ri, mask):
            # params as an ARGUMENT: closing over them embeds ~300 MB of
            # weights as constants in the executable (and the compile cache)
            out = fwd(params, sfeat * (1.0 + i.astype(jnp.float32) * 1e-4),
                      z, r, t_, ri, mask)
            return sum(jnp.sum(jnp.asarray(o, jnp.float32)[..., :1])
                       for o in jax.tree_util.tree_leaves(out))

        tm = bench(seg_fn, params, sfeat, z, r, t_, ri, mask, rep=4, inner=8)
        seg[str(nres)] = {"ms": round(tm * 1e3, 1),
                          "reference_demo_ms": ref_ms[nres]}
        print(f"# segment fwd {nres}: {tm*1e3:.1f} ms "
              f"(ref demo {ref_ms[nres]} ms)", file=sys.stderr)
    configs["segment_forward"] = seg

    # ---- config 4: createdb embedding throughput --------------------------
    from merizo_search_tpu.models import foldclass as fc

    fparams = jax.jit(fc.init_params)(jax.random.PRNGKey(0))
    bsz, nres = 64, 128
    coords = jnp.asarray(rng.normal(size=(bsz, nres, 3)).astype(np.float32))
    cmask = jnp.ones((bsz, nres), jnp.float32)

    def emb_fn(i, fparams, coords, cmask):
        e = fc.embed(params=fparams,
                     coords=coords * (1.0 + i.astype(jnp.float32) * 1e-4),
                     mask=cmask)
        return jnp.sum(e)

    te = bench(emb_fn, fparams, coords, cmask, rep=4, inner=16)
    configs["createdb_embed"] = {
        "batch": bsz, "residues": nres,
        "structs_per_s": round(bsz / te, 0),
        "note": "batched Foldclass embedding (reference makedb.py embeds "
                "one structure per forward, unbatched)",
    }
    print(f"# createdb embed: {bsz/te:.0f} structs/s (batch {bsz}x{nres})",
          file=sys.stderr)
    return qps, rec


def stream_benchmark(configs):
    """Config 5: larger-than-HBM streaming over an on-disk int8-sidecar DB."""
    import jax.numpy as jnp

    from merizo_search_tpu.db import codecs
    from merizo_search_tpu.search.engine import SearchEngine

    n = 1 << STREAM_LOGN
    root = os.path.join(CACHE_ROOT, f"streamdb_{STREAM_LOGN}")
    prefix = os.path.join(root, "ted")
    if not os.path.exists(prefix + ".json"):
        os.makedirs(root, exist_ok=True)
        rng = np.random.default_rng(0)
        base = "ted"
        # fp32 file is a sparse stand-in (the int8 sidecar is what streams);
        # names/seq/ca index files likewise — layout-complete, data-free
        with open(os.path.join(root, base + "_raw_128d_norm.db"), "wb") as fh:
            fh.truncate(n * DIM * 4)
        for suf, sz in ((f"_raw_128d.index_names", n * codecs.NAME_RECORD),
                        ("_seq.index", n * 16), ("_seq.db", 1),
                        ("_ca.index", n * 16), ("_ca.db", 1)):
            with open(os.path.join(root, base + suf), "wb") as fh:
                fh.truncate(sz)
        with open(os.path.join(root, base + "_raw_128d_norm.int8"), "wb") as fh:
            chunk = 1 << 22
            for i0 in range(0, n, chunk):
                m = min(chunk, n - i0)
                fh.write(rng.integers(-127, 128, (m, DIM),
                                      dtype=np.int8).tobytes())
        with open(os.path.join(root, base + "_raw_128d_norm.scales"), "wb") as fh:
            fh.write(np.full(n, 1 / 40.0, np.float32).tobytes())
        info = {"dbfname_IP": base + "_raw_128d_norm.db",
                "db_names_f": base + "_raw_128d.index_names",
                "sif": base + "_seq.index", "sdf": base + "_seq.db",
                "cif": base + "_ca.index", "cdf": base + "_ca.db",
                "dbfname_int8": base + "_raw_128d_norm.int8",
                "dbfname_scales": base + "_raw_128d_norm.scales",
                "QUANT_BLOCK": codecs.QUANT_BLOCK,
                "DB_SIZE": n, "DB_DIM": DIM}
        with open(prefix + ".json", "w") as fh:
            json.dump(info, fh)

    # host read roofline: sequential page-cache/disk bandwidth of the sidecar
    mm = np.memmap(os.path.join(root, "ted_raw_128d_norm.int8"),
                   dtype=np.int8, mode="r")
    acc = 0
    t0 = time.perf_counter()
    step = 1 << 26
    for i0 in range(0, min(len(mm), 1 << 30), step):
        acc += int(np.asarray(mm[i0:i0 + step:4096]).sum())  # touch pages
    t_touch = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i0 in range(0, min(len(mm), 1 << 30), step):
        acc += int(np.asarray(mm[i0:i0 + step]).sum())
    host_gbps = min(len(mm), 1 << 30) / (time.perf_counter() - t0) / 1e9
    del mm, acc, t_touch

    # host->device bandwidth: on a production TPU VM this is a local PCIe/DMA
    # link (~10-50 GB/s); HERE the chip sits behind a network tunnel, which
    # becomes the binding constraint of stream mode — measure it and report
    # both the measured qps and the local-host projection
    import jax

    buf = np.ones((1 << 27,), np.int8)  # 128 MB
    jax.device_put(buf[: 1 << 20]).block_until_ready()
    t_h2d = min(_timed(lambda: jax.device_put(buf).block_until_ready())
                for _ in range(2))
    h2d_gbps = buf.nbytes / t_h2d / 1e9

    db = codecs.FlatDB.open(prefix)
    eng = SearchEngine(db, dtype=jnp.int8, max_device_gb=0.05)
    assert eng.mode == "stream"
    rng = np.random.default_rng(1)
    q = rng.normal(size=(N_QUERIES, DIM)).astype(np.float32)
    eng.search(q, k=K)  # compile + page-cache warm
    t = _timed(lambda: eng.search(q, k=K))
    qps = N_QUERIES / t
    scan_gbps = n * DIM / t / 1e9
    bytes_total = n * DIM

    # device-side cost isolation (VERDICT r3 item 10): one stream
    # superblock (stream_block rows), already HBM-resident, scanned with
    # the same fused int8 kernel + per-superblock top-k the stream loop
    # dispatches — the pure device leg, with the h2d/host-read legs (and
    # the tunnel) out of the picture. The whole-stream device time is
    # nsb x this; comparing it to the measured batch time shows how much
    # of stream mode is staging, not scan.
    import jax
    from _bench_util import bench as _bench
    from merizo_search_tpu.ops import pallas_scan as _ps

    sb_rows = eng.stream_block
    sb8 = jnp.asarray(
        np.random.default_rng(2).integers(-127, 128, (sb_rows, DIM),
                                          dtype=np.int8))
    sb_scales = jnp.full((sb_rows,), np.float32(1 / 40.0))
    q8 = jnp.asarray(np.clip(q * 124, -124, 124).astype(np.int8))

    def _dev_fn(i, qq, dd, ss):
        v, idx = _ps.fused_topk(qq + (i % 3).astype(jnp.int8), dd,
                                dd.shape[0], K, scales=ss)
        return jnp.sum(v) + jnp.sum(idx[:, 0].astype(jnp.float32))

    t_dev_sb = _bench(_dev_fn, q8, sb8, sb_scales, rep=3, inner=4)
    nsb = -(-n // sb_rows)
    t_dev_total = t_dev_sb * nsb
    # projected wall-clock with a local host link: replace the h2d leg with
    # 16 GB/s PCIe-class staging, keep the measured host read + device time
    t_local = max(bytes_total / (host_gbps * 1e9),
                  t - bytes_total / (h2d_gbps * 1e9)
                  + bytes_total / 16e9)
    # TED-365M on a v5e-8 (VERDICT r3 item 10), from measured rooflines:
    # 365M x 128 int8 = 46.7 GB. Sharded over 8 chips it is 5.8 GB/chip —
    # it FITS in v5e HBM (16 GB/chip), so the production deployment is the
    # device-resident mesh int8 scan, not disk streaming: per-chip leg =
    # the measured device superblock rate at 45.6M rows + an O(Q*k) ICI
    # all-gather merge (sub-ms). Streaming only applies single-chip, where
    # it is host-read-bound (the int8 sidecar's sequential page-cache rate).
    ted_rows = 365_000_000
    t_stream_1chip = ted_rows * DIM / (host_gbps * 1e9)
    configs["ted_stream"] = {
        "rows": n, "dtype": "int8 (on-disk sidecar)",
        "q_batch": N_QUERIES,
        "seconds_per_batch": round(t, 2),
        "qps": round(qps, 1),
        "scan_GBps": round(scan_gbps, 2),
        "host_read_roofline_GBps": round(host_gbps, 2),
        "h2d_GBps_measured": round(h2d_gbps, 3),
        "bottleneck": ("tunnel h2d" if h2d_gbps < host_gbps else "host read"),
        "projected_qps_local_host_16GBps_pcie": round(N_QUERIES / t_local, 1),
        "device_leg_isolated": {
            "superblock_rows": sb_rows,
            "ms_per_superblock": round(t_dev_sb * 1e3, 2),
            "whole_db_device_s": round(t_dev_total, 3),
            "device_share_of_batch": round(t_dev_total / t, 3),
            "note": "HBM-resident superblock scanned with the exact "
                    "per-superblock kernel+top-k the stream loop dispatches "
                    "(page-cache-hot host reads and h2d staging excluded): "
                    "the device could absorb the whole DB in this time; the "
                    "rest of the measured batch is staging.",
        },
        "single_chip_stream_qps_host_read_bound": round(
            N_QUERIES / t_stream_1chip, 1),
        "ted365m_note": "the TED-365M deployment answer is the MEASURED "
                        "resident per-chip shard scan in the "
                        "ted365m_shard_resident section (r4's projection "
                        "replaced); streaming remains the "
                        "larger-than-mesh-HBM fallback",
        "note": "this chip sits behind a network tunnel; stream mode stages "
                "every superblock host->HBM, so the tunnel's h2d bandwidth "
                "binds here. On a TPU VM (local PCIe) the same path is "
                "host-read-bound; the int8 sidecar cuts that IO 4x vs fp32. "
                "TED-365M is this path at 43x rows.",
    }
    print(f"# stream {n} rows int8: {t:.2f} s/batch ({qps:.1f} q/s, "
          f"{scan_gbps:.2f} GB/s; h2d {h2d_gbps:.2f} GB/s, host read "
          f"{host_gbps:.2f} GB/s, projected local-host qps "
          f"{N_QUERIES/t_local:.0f})", file=sys.stderr)


def easy_search_benchmark(configs):
    """Config 6: whole-pipeline easy-search wall-clock (BASELINE rows 1-3).

    segment -> embed -> flat scan -> TM-align rescore -> TSV writers, per
    structure, on the reference's own example inputs (432 / 587 / 775
    residues) against a CATH-toy-scale (66,944 x 128) pt-layout DB with
    protein-like synthetic CA traces. Weights are the seeded random-init
    substitutes (trained weights are stripped from the mirror), so hit
    CONTENT is synthetic — but every pipeline stage does its real work:
    mincos is disabled and k=10 so each domain TM-aligns 10 candidates,
    matching the examples/README.md k=10 acceptance runs.

    Reference anchors (unspecified hardware, README.md:181-183):
    easy-search on the 432-res AF-Q96HM7 example took 22.74 s/structure.
    """
    import shutil

    from merizo_search_tpu.db import codecs
    from merizo_search_tpu import cli as mcli

    root = os.path.join(CACHE_ROOT, "easydb")
    prefix = os.path.join(root, "cathtoy")
    n = 66944  # examples/database CATH toy slice is 66,943 rows
    if not os.path.exists(prefix + ".pt"):
        os.makedirs(root, exist_ok=True)
        rng = np.random.default_rng(7)
        embs = rng.standard_normal((n, DIM), dtype=np.float32)
        embs /= np.linalg.norm(embs, axis=1, keepdims=True)
        entries = []
        for i in range(n):
            ln = int(rng.integers(60, 300))
            ca = np.cumsum(rng.standard_normal((ln, 3)) * 2.2,
                           axis=0).astype(np.float32)
            entries.append((f"cath{i:06d}", ca, "A" * ln))
        codecs.write_pt_db(prefix, embs, entries)

    ex = "/root/reference/examples"
    inputs = [("AF-Q96HM7-F1-model_v4.pdb", 432),
              ("3w5h.pdb", 587),
              ("AF-Q96PD2-F1-model_v4.pdb", 775)]
    outdir = os.path.join(root, "out")
    shutil.rmtree(outdir, ignore_errors=True)
    os.makedirs(outdir, exist_ok=True)

    # --- cold: one fresh CLI invocation, as a user's first run sees it
    # (param load + DB upload + compile-cache hits + pipeline) -------------
    def run_cli(fname, tag):
        mcli.main(["easy-search", os.path.join(ex, fname), prefix,
                   os.path.join(outdir, tag), "-k", "10", "--mincos", "-1",
                   "--merizo_output", outdir])

    run_cli(inputs[0][0], "warmup")           # compiles (persistent-cached)
    t_cold = _timed(lambda: run_cli(inputs[0][0], "cold"))

    # --- warm/amortized: the serving configuration — weights loaded once,
    # DB resident once (exactly what `merizo-tpu serve` holds persistent);
    # per-structure wall-clock covers segment -> embed -> scan -> TM-align
    # -> writers, with the per-phase split from utils/profiling -----------
    import jax.numpy as jnp

    from merizo_search_tpu.db.codecs import FlatDB
    from merizo_search_tpu.io.results import (
        SEARCH_FIELDS, write_search_results, write_segment_results)
    from merizo_search_tpu.models.merizo.network import load_merizo_params
    from merizo_search_tpu.pipeline.dbsearch import run_dbsearch
    from merizo_search_tpu.pipeline.embed import load_foldclass_params
    from merizo_search_tpu.search.engine import SearchEngine
    from merizo_search_tpu.segment.outputs import run_merizo
    from merizo_search_tpu.utils import profiling

    mz_params = load_merizo_params(None)
    fc_params = load_foldclass_params(None)
    engine = SearchEngine(FlatDB.open(prefix), dtype=jnp.bfloat16)

    def run_warm(fname, tag):
        out = os.path.join(outdir, tag)
        domains, seg_results = run_merizo(mz_params,
                                          [os.path.join(ex, fname)],
                                          merizo_output=outdir)
        write_segment_results(seg_results, out + "_segment.tsv")
        results, _ = run_dbsearch(domains, prefix, topk=10, mincos=-1.0,
                                  inputs_are_ca=True, params=fc_params,
                                  engine=engine)
        write_search_results(results, out + "_search.tsv",
                             SEARCH_FIELDS.split(","))

    run_warm(inputs[0][0], "warmwarm")
    per, phases = {}, {}
    for fname, nres in inputs:
        run_warm(fname, f"w{nres}")   # compile this shape's buckets first so
        profiling.reset()             # the phase averages time serving only
        t = min(_timed(lambda: run_warm(fname, f"t{nres}"))
                for _ in range(3))
        per[str(nres)] = round(t, 3)
        # per-phase split of the LAST timed run set (3 runs accumulated)
        ph = profiling.timings()
        tot = {k: v[0] for k, v in ph.items()}
        nruns = max(v[1] for v in ph.values()) if ph else 1
        phases[str(nres)] = {k: round(v / max(ph[k][1], 1), 4)
                             for k, v in tot.items()}
        print(f"# easy-search e2e {nres}res: {t:.3f} s/structure warm "
              f"(phases: {phases[str(nres)]})", file=sys.stderr)
    ref_432 = 22.74
    configs["easy_search_e2e"] = {
        "db_rows": n, "k": 10, "mincos": -1.0,
        "seconds_per_structure_warm": per,
        "phase_seconds_per_call": phases,
        "seconds_cold_first_run_432": round(t_cold, 3),
        "reference_seconds_432res": ref_432,
        "speedup_vs_reference_432res": round(ref_432 / per["432"], 1),
        "note": "full segment->embed->scan->TM-align->writers pipeline on "
                "the reference example PDBs vs a 66,944-row synthetic "
                "CATH-toy pt DB; seeded random-init weights (trained "
                "weights stripped from the mirror), mincos disabled so "
                "k=10 TM-aligns run per domain. 'warm' amortizes weight "
                "load + DB residency across runs (the serve-mode "
                "configuration); the cold number is a fresh CLI process' "
                "first run including param load and DB upload through "
                "this rig's ~25 ms RTT tunnel",
    }


def ted_shard_benchmark(configs):
    """Config 5b: the MEASURED TED-365M per-chip shard scan (VERDICT r4
    item 2 — replaces r4's projection).

    BASELINE's target regime is 365M x 128 over a v5e-8 mesh = 45,625,000
    rows per chip: int8 5.8 GB / bf16 11.7 GB, both resident in this
    chip's 16 GB HBM. Scans the exact per-chip slice with the production
    fused_topk (k=100) at Q=64 (bandwidth-bound — the speed-of-light
    regime) and Q=256 (serving batch), plus a same-footprint read-ceiling
    probe so the SoL fractions are calibration-independent. The mesh
    answer = per-chip scan + a [Q,k] 8-way merge, costed from the MEASURED
    single-chip merge compute plus ICI transfer at a conservative
    100 GB/s effective (the gathered partials are ~200 KB — ICI time is
    microseconds; r4's 'sub-ms, excluded' assertion replaced by data).

    Note the per-batch phase B/C selection cost is a constant, so SoL
    fractions IMPROVE with shard size: the 16M-row section under-reports
    the deployment regime — both are published.
    """
    import jax
    import jax.numpy as jnp

    from _bench_util import bench
    from merizo_search_tpu.ops.pallas_scan import fused_topk
    from merizo_search_tpu.ops import topk as topk_ops

    ted_rows = 365_000_000
    ndev = 8
    rows = ted_rows // ndev
    tile = 32768
    npad = -(-rows // tile) * tile
    kq, kd = jax.random.split(jax.random.PRNGKey(3))

    def read_probe(i, db):
        w = (1.0 + i.astype(jnp.float32) * 1e-3).astype(db.dtype)
        return jnp.sum((db * w).astype(jnp.float32))

    def scan_fn(i, q0, db, *s):
        q = q0 * (1.0 + i.astype(db.dtype) * db.dtype.type(1e-3)) \
            if db.dtype != jnp.int8 else q0 + (i % 3).astype(jnp.int8)
        v, idx = fused_topk(q, db, rows, K, scales=(s[0] if s else None))
        return jnp.sum(v) + jnp.sum(idx[:, 0].astype(jnp.float32))

    def merge_fn(i, av, ai):
        v, idx = topk_ops.merge_partials(av + i.astype(jnp.float32), ai, K)
        return jnp.sum(v[:, 0]) + jnp.sum(idx[:, 0].astype(jnp.float32))

    out = {"rows_per_chip": rows, "ndev": ndev, "k": K}
    for dtype_name in ("bf16", "int8"):
        if dtype_name == "bf16":
            db = jax.jit(lambda k: jax.random.normal(
                k, (npad, DIM), jnp.bfloat16))(kd)
            scales = ()
            itemsize, peak = 2, BF16_FLOPS
        else:
            db = jax.jit(lambda k: jnp.clip(
                jax.random.normal(k, (npad, DIM), jnp.bfloat16)
                .astype(jnp.float32) * 40, -127, 127).astype(jnp.int8))(kd)
            scales = (jnp.full((npad,), jnp.float32(1 / 40.0)),)
            itemsize, peak = 1, INT8_OPS
        db.block_until_ready()
        gb = npad * DIM * itemsize / 1e9
        t_read = bench(read_probe, db, rep=4, inner=4)
        sec = {"read_probe_GBps": round(gb / t_read, 0)}
        for qn in (64, 256):
            q0 = jax.random.normal(kq, (qn, DIM), jnp.float32)
            q0 = q0 / jnp.linalg.norm(q0, axis=1, keepdims=True)
            q0 = (q0.astype(jnp.bfloat16) if dtype_name == "bf16"
                  else jnp.clip(q0 * 124, -124, 124).astype(jnp.int8))
            t = bench(scan_fn, q0, db, *scales, rep=4, inner=4)
            av = jax.random.normal(kq, (ndev, qn, K), jnp.float32)
            ai = jax.random.randint(kq, (ndev, qn, K), 0, 1 << 25, jnp.int32)
            t_merge = bench(merge_fn, av, ai, rep=3, inner=16)
            t_ici = 2 * qn * K * 4 * (ndev - 1) / 100e9
            t_mesh = t + t_merge + t_ici
            sol = _sol_seconds(npad, qn, itemsize, peak)
            sec[f"q{qn}"] = {
                "ms_per_batch": round(t * 1e3, 2),
                "qps_per_chip": round(qn / t, 0),
                "GBps_equiv": round(gb / t, 0),
                "sol_fraction": round(sol / t, 3),
                "sol_fraction_vs_measured_read": round(t_read / t, 3),
                "merge_compute_ms": round(t_merge * 1e3, 3),
                "ici_model_ms": round(t_ici * 1e3, 4),
                "measured_shard_qps_v5e8_whole_ted365m": round(
                    qn / t_mesh, 0),
            }
            print(f"# ted-shard {dtype_name} Q={qn}: {t*1e3:.2f} ms "
                  f"({gb/t:.0f} GB/s, vs_read {t_read/t:.3f}); mesh "
                  f"whole-TED {qn/t_mesh:.0f} q/s", file=sys.stderr)
        out[dtype_name] = sec
        del db, scales
    if "q64" in out.get("bf16", {}) and "q64" in out.get("int8", {}):
        out["int8_vs_bf16_qps_q64"] = round(
            out["int8"]["q64"]["qps_per_chip"]
            / out["bf16"]["q64"]["qps_per_chip"], 2)
        out["int8_vs_bf16_qps_q256"] = round(
            out["int8"]["q256"]["qps_per_chip"]
            / out["bf16"]["q256"]["qps_per_chip"], 2)
    configs["ted365m_shard_resident"] = out


def reference_cpu_qps():
    """The reference's dense scan (dbsearch.py:75-81) in torch on host CPU,
    timed on a subsample and scaled to the full DB size."""
    import torch

    sub = 1 << 18
    torch.manual_seed(0)
    db = torch.nn.functional.normalize(torch.randn(sub, DIM))
    q = torch.nn.functional.normalize(torch.randn(N_QUERIES, DIM))
    with torch.no_grad():
        for qi in range(2):
            s = torch.nn.functional.cosine_similarity(db, q[qi:qi + 1], dim=-1)
            torch.topk(s, K, dim=0)
        t0 = time.perf_counter()
        nq_timed = 8
        for qi in range(nq_timed):
            s = torch.nn.functional.cosine_similarity(db, q[qi:qi + 1], dim=-1)
            torch.topk(s, K, dim=0)
        t = time.perf_counter() - t0
    per_query_full_db = (t / nq_timed) * (DB_N / sub)
    print(f"# reference torch-cpu scan: {per_query_full_db*1e3:.1f} ms/query "
          f"(scaled to {DB_N} rows)", file=sys.stderr)
    return 1.0 / per_query_full_db


def _enable_compile_cache():
    try:
        import jax

        cache_dir = os.path.join(CACHE_ROOT, "jax")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        print(f"# compile cache disabled: {e}", file=sys.stderr)


def cpu_fallback_qps():
    """Small-scale CPU measurement of the same engine scan, clearly labelled,
    so a TPU/tunnel outage still yields a recorded benchmark. Runs in a
    scrubbed subprocess so a half-initialised TPU backend can't poison it."""
    import subprocess

    code = r"""
import sys, time, json
import numpy as np
sys.path.insert(0, "/root/repo")
import jax.numpy as jnp
from merizo_search_tpu.ops.topk import topk_scan
n, d, q = 1 << 20, 128, 64
rng = np.random.default_rng(0)
db = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32))
qq = jnp.asarray(rng.standard_normal((q, d), dtype=np.float32))
v, i = topk_scan(qq, db, n, 100, 1 << 18)
v.block_until_ready()
t0 = time.perf_counter()
for _ in range(3):
    v, i = topk_scan(qq, db, n, 100, 1 << 18)
    v.block_until_ready()
t = (time.perf_counter() - t0) / 3
print(json.dumps({"qps": q / t * (n / (1 << 24))}))
"""
    # PALLAS_AXON*/AXON_* must go too: the baked sitecustomize calls the
    # axon register() at EVERY interpreter start when PALLAS_AXON_POOL_IPS
    # is set (even under JAX_PLATFORMS=cpu), and a wedged tunnel blocks
    # there — before any import of ours runs
    env = {k: v for k, v in os.environ.items()
           if not (k.startswith(("TPU", "LIBTPU", "CLOUD_TPU", "PJRT",
                                 "PALLAS_AXON", "AXON_"))
                   or k in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME", "XLA_FLAGS"))}
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=600)
    return json.loads(r.stdout.strip().splitlines()[-1])["qps"]


def _tpu_reachable(timeout=420, allow_fast_fail=True) -> bool:
    """Probe device init in a SUBPROCESS with a hard deadline: a half-up
    tunnel can make jax.devices() hang (or take ~20 min to error) in-process,
    which would stall the whole bench past any driver timeout with no JSON
    line emitted. A healthy axon init completes well under this deadline.

    Fast path: when the pool relay is loopback (this deployment) and its
    session ports actively REFUSE connections, the relay process itself is
    down and the expensive jax probe cannot succeed — skip it so each retry
    costs seconds, not the full deadline. Any other TCP outcome (open,
    filtered, different port layout) falls through to the real probe."""
    import subprocess

    if allow_fast_fail and os.environ.get("PALLAS_AXON_POOL_IPS") == "127.0.0.1":
        import socket
        refused = 0
        for port in (8082, 8083):
            s = socket.socket()
            s.settimeout(3)
            try:
                s.connect(("127.0.0.1", port))
            except ConnectionRefusedError:
                refused += 1
            except OSError:
                pass
            finally:
                s.close()
        if refused == 2:
            print("# TPU relay TCP-down (loopback ports refused); "
                  "skipping device probe", file=sys.stderr)
            return False

    code = ("import jax; d = jax.devices(); "
            "print('ok' if d and d[0].platform != 'cpu' else 'cpu')")
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=timeout)
        return r.returncode == 0 and "ok" in r.stdout
    except Exception as e:
        print(f"# TPU probe failed: {type(e).__name__}", file=sys.stderr)
        return False


def main():
    _enable_compile_cache()
    configs = {}
    # the tunnel occasionally wedges for a few minutes; one failed probe
    # must not demote the round's artifact to the CPU fallback, so retry
    # with a bounded backoff (~15 min worst case, still far under the
    # driver's bench budget)
    retries = int(os.environ.get("MERIZO_BENCH_PROBE_RETRIES", "3"))
    for attempt in range(retries):
        # the TCP fast-fail hardcodes this deployment's relay port layout;
        # the LAST attempt always runs the real device probe so a healthy
        # relay on unexpected ports costs retries-1 fast checks, never a
        # silent demotion to the CPU fallback
        tpu_ok = _tpu_reachable(allow_fast_fail=attempt + 1 < retries)
        if tpu_ok:
            break
        if attempt + 1 < retries:
            wait = 120 * (attempt + 1)
            print(f"# TPU probe attempt {attempt + 1}/{retries} failed; "
                  f"retrying in {wait}s", file=sys.stderr)
            time.sleep(wait)
    try:
        if not tpu_ok:
            raise RuntimeError("TPU backend unreachable (probe timed out)")
        qps, recall = tpu_benchmarks(configs)
        metric = f"exact_search_qps_{DB_N//(1<<20)}M_db_k{K}"
    except Exception as e:
        print(f"# TPU bench failed ({type(e).__name__}: {str(e)[:300]}); "
              f"falling back to a CPU-scaled measurement", file=sys.stderr)
        qps = cpu_fallback_qps()
        metric = f"exact_search_qps_{DB_N//(1<<20)}M_db_k{K}_CPU_FALLBACK"
    try:
        if not tpu_ok:
            raise RuntimeError("TPU backend unreachable (probe timed out)")
        ted_shard_benchmark(configs)
    except Exception as e:
        configs["ted365m_shard_resident"] = {
            "error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(f"# ted shard bench failed: {e}", file=sys.stderr)
    try:
        if not tpu_ok:
            raise RuntimeError("TPU backend unreachable (probe timed out)")
        stream_benchmark(configs)
    except Exception as e:
        configs["ted_stream"] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(f"# stream bench failed: {e}", file=sys.stderr)
    try:
        if not tpu_ok:
            raise RuntimeError("TPU backend unreachable (probe timed out)")
        easy_search_benchmark(configs)
    except Exception as e:
        configs["easy_search_e2e"] = {
            "error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(f"# easy-search e2e bench failed: {e}", file=sys.stderr)
    try:
        base = reference_cpu_qps()
    except Exception as e:
        print(f"# baseline measurement failed: {e}", file=sys.stderr)
        base = None
    out = {
        "metric": metric,
        "value": round(qps, 2),
        "unit": "queries/s",
        "vs_baseline": round(qps / base, 2) if base else None,
        "sol_fraction": configs.get("flat_scan_16M", {}).get(
            "bf16_sol_fraction"),
        "configs": configs,
    }
    _record_last_good(out, tpu_ok and "CPU_FALLBACK" not in metric)
    print(json.dumps(out))


def _record_last_good(out: dict, tpu_run_ok: bool) -> None:
    """The TPU sits behind a tunnel that occasionally wedges for hours; a
    fallback artifact would otherwise erase every previously measured TPU
    number. Persist each successful TPU bench (with timestamp + git rev),
    and on a fallback attach it under 'last_known_good_tpu' — clearly
    labeled as a PRIOR measurement, never as this run's value."""
    path = os.path.join(CACHE_ROOT, "bench_last_good.json")
    try:
        if tpu_run_ok:
            import subprocess
            rev = subprocess.run(
                ["git", "-C", os.path.dirname(os.path.abspath(__file__)),
                 "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True).stdout.strip()
            os.makedirs(CACHE_ROOT, exist_ok=True)
            with open(path, "w") as fh:
                json.dump({"measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                                        time.gmtime()),
                           "git_rev": rev,
                           "metric": out["metric"],
                           "value": out["value"],
                           "configs": out["configs"]}, fh)
        elif os.path.exists(path):
            with open(path) as fh:
                out["last_known_good_tpu"] = json.load(fh)
        else:
            # no cached run yet (the cache feature may postdate the last
            # successful TPU bench): fall back to the newest driver-recorded
            # round artifact, clearly labeled with its file provenance
            import glob
            here = os.path.dirname(os.path.abspath(__file__))
            arts = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
            for art in reversed(arts):
                with open(art) as fh:
                    rec = json.load(fh)
                if rec.get("rc") == 0 and "CPU_FALLBACK" not in str(
                        rec.get("parsed", {}).get("metric", "")):
                    out["last_known_good_tpu"] = {
                        "source": os.path.basename(art) +
                                  " (driver round artifact)",
                        "measured_at": time.strftime(
                            "%Y-%m-%dT%H:%M:%SZ",
                            time.gmtime(os.path.getmtime(art))),
                        **rec.get("parsed", {}),
                    }
                    break
    except Exception as e:  # never let bookkeeping break the artifact
        print(f"# last-good bookkeeping skipped: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
