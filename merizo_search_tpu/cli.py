"""Command-line interface: segment / createdb / search / easy-search.

Parity target: merizo_search/merizo.py:33-443 — same four verbs, same flag
vocabulary and defaults, same output files — so reference users can switch
with their existing invocations. TPU-specific additions: --db_format mmap,
--mesh N (shard the DB over N devices), --weights/--merizo_weights for
converted checkpoints, --skip_tmalign.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

logger = logging.getLogger(__name__)


def setup_logging():
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s | %(levelname)s | %(message)s")


def enable_compilation_cache():
    """Persist XLA compilations across runs (~/.cache/merizo_tpu/jax or
    $MERIZO_TPU_CACHE). First-run jit compiles of the models are tens of
    seconds; repeat invocations then start hot — the CLI equivalent of a
    long-running server."""
    try:
        import jax
        cache_dir = os.environ.get(
            "MERIZO_TPU_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "merizo_tpu", "jax"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimisation, never fatal
        logger.debug("compilation cache disabled: %s", e)


def _add_trace_flag(p: argparse.ArgumentParser):
    p.add_argument("--trace", type=str, default=None, metavar="DIR",
                   help="Capture a JAX device trace (TensorBoard/XProf) into DIR.")


def _finish(label: str, t0: float):
    from .utils import profiling
    profiling.report(logger)
    logger.info("Finished %s in %.3f seconds.", label, time.time() - t0)


def _ensure_parent(path: str):
    """Create the parent directory of an output prefix if missing, so
    `merizo-tpu search q.pdb db out/results` works without a prior mkdir."""
    parent = os.path.dirname(os.path.abspath(path))
    if parent:
        os.makedirs(parent, exist_ok=True)


def _add_search_flags(p: argparse.ArgumentParser):
    p.add_argument("-d", "--device", type=str, default=None,
                   help="JAX platform override (e.g. 'cpu', 'tpu'). Default: auto.")
    p.add_argument("-k", "--topk", type=int, default=1,
                   help="Max number of domain matches to return for each query.")
    p.add_argument("-t", "--threads", type=int, default=-1,
                   help="CPU threads for native TM-align rescoring "
                        "(<=0 = all cores; JAX manages its own pool).")
    p.add_argument("-s", "--mincos", type=float, default=0.5,
                   help="Min cosine similarity to database matches.")
    p.add_argument("-m", "--mintm", type=float, default=0.5,
                   help="Min TM-score to database matches.")
    p.add_argument("-c", "--mincov", type=float, default=0.7,
                   help="Min coverage of database matches.")
    p.add_argument("-f", "--fastmode", action="store_true",
                   help="Fast mode for TM rescoring (fewer refinement iterations).")
    p.add_argument("--search_batchsize", type=int, default=262144)
    p.add_argument("--search_metric", type=str, default="IP",
                   help="Only 'IP' (cosine) is supported.")
    p.add_argument("--report_insignificant_hits", action="store_true", default=False)
    p.add_argument("--metadata_json", action="store_true", default=False)
    p.add_argument("--output_headers", action="store_true", default=False)
    p.add_argument("--multi_domain_search", action="store_true", default=False)
    p.add_argument("--multi_domain_mode", type=str, default="exhaustive_tmalign",
                   choices=["exhaustive_tmalign", "embscore"],
                   help="'exhaustive_tmalign' scores domain pairs with the "
                        "batched aligner; 'embscore' uses embedding cosine "
                        "similarity read straight off the database (no "
                        "alignment — the fast path at TED scale; the "
                        "reference declares this mode but does not "
                        "implement it).")
    p.add_argument("--skip_tmalign", action="store_true", default=False,
                   help="Skip TM rescoring (embedding scores only).")
    p.add_argument("--tmalign_backend", type=str, default="auto",
                   choices=["auto", "native", "tpu"],
                   help="TM-align rescoring backend: in-process C++ library "
                        "('native'), batched JAX aligner ('tpu'), or pick "
                        "automatically.")
    p.add_argument("--mesh", type=int, default=0,
                   help="Shard the DB across this many devices (0 = single device).")
    p.add_argument("--precision", type=str, default="bf16",
                   choices=["fp32", "bf16", "int8"],
                   help="On-device DB storage for the scan: bf16 halves HBM "
                        "traffic with ~1e-3 cosine rounding (exact top-k of "
                        "the rounded scores); int8 quarters it (~1e-2); fp32 "
                        "is bit-faithful to the reference's scores.")
    p.add_argument("--weights", type=str, default=None,
                   help="Path to a converted Foldclass checkpoint (.pt).")
    p.add_argument("--search_index", type=str, default="flat",
                   choices=["flat", "ivf"],
                   help="'flat' = exact full scan; 'ivf' = balanced-cluster "
                        "inverted file, probing --nprobe clusters per query "
                        "(sublinear, for latency-sensitive serving).")
    p.add_argument("--nprobe", type=int, default=32,
                   help="IVF clusters probed per query.")
    p.add_argument("--nlist", type=int, default=0,
                   help="IVF cluster count (0 = ~sqrt(DB size)).")
    p.add_argument("--ivf_rerank", action="store_true", default=False,
                   help="Exact f32 re-rank of the top-(k+1) probed blocks "
                        "(IVF only): removes the storage-dtype ranking "
                        "noise that caps recall (~0.98 bf16 / ~0.95 int8 "
                        "-> ~probe ceiling). Costs +4 bytes/dim/row of "
                        "device memory and ~one extra f32 block gather "
                        "per query.")
    p.add_argument("--mmap_cov_filter", action="store_true", default=False,
                   help="Apply the -c/--mincov coverage filters on mmap "
                        "databases too. The reference never implemented "
                        "mincov on its faiss/mmap path (dbsearch.py:307-310 "
                        "TODO) and the default replicates that for hit-set "
                        "parity; this flag fixes it, making pt and mmap "
                        "layouts return identical hit sets.")


def _add_merizo_flags(p: argparse.ArgumentParser):
    p.add_argument("--merizo_output", type=str, default=os.environ.get("PWD", os.getcwd()))
    p.add_argument("--save_pdf", action="store_true", default=False)
    p.add_argument("--save_pdb", action="store_true", default=False)
    p.add_argument("--save_domains", action="store_true", default=False)
    p.add_argument("--save_fasta", action="store_true", default=False)
    p.add_argument("--conf_filter", type=float, default=None)
    p.add_argument("--plddt_filter", type=float, default=None)
    p.add_argument("--iterate", action="store_true")
    p.add_argument("--length_conditional_iterate", action="store_true")
    p.add_argument("--max_iterations", type=int, default=3)
    p.add_argument("--shuffle_indices", action="store_true", default=False)
    p.add_argument("--return_indices", action="store_true", default=False)
    p.add_argument("--min_domain_size", type=int, default=50)
    p.add_argument("--min_fragment_size", type=int, default=10)
    p.add_argument("--domain_ave_size", type=int, default=200)
    p.add_argument("--conf_threshold", type=float, default=0.5)
    p.add_argument("--pdb_chain", type=str, default="A")
    p.add_argument("--merizo_weights", type=str, default=None,
                   help="Directory with converted Merizo weight shards.")


def _fix_positional_tail(args) -> None:
    """Disambiguate `input+ db_name output [tmp]`.

    The reference requires `tmp` (merizo.py:132); here it is optional, but
    argparse's greedy match for 'A+ A A A?' always leaves tmp=None and feeds
    the extra value to `input`. When that happened (the would-be db_name is
    not a database but the last 'input' is), shift the tail one slot right.
    """
    from .io.results import database_exists

    if (args.tmp is None and len(args.input) > 1
            and not database_exists(args.db_name)
            and database_exists(args.input[-1])):
        args.tmp = args.output
        args.output = args.db_name
        args.db_name = args.input.pop()
        logger.warning(
            "interpreted positionals reference-style as "
            "`input+ db_name output tmp`: db=%s output=%s tmp=%s "
            "(pass named flags or omit tmp to avoid the guess)",
            args.db_name, args.output, args.tmp)


def _apply_device(device: str | None):
    # No -d flag: honour a JAX_PLATFORMS=cpu env override through the
    # config API. On images whose sitecustomize registers an out-of-tree
    # TPU plugin at interpreter start, the env var alone DEADLOCKS backend
    # init (plugin discovery still contacts the device tunnel), while the
    # config-API override is applied cleanly before first backend use —
    # the same trick tests/conftest.py uses. ONLY "cpu" is mirrored: images
    # preset JAX_PLATFORMS to the plugin's own platform name (e.g. "axon"),
    # which the config API rejects as unknown even though the env-var path
    # accepts it — mirroring it would break every default-environment run.
    env = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    plat = device or ("cpu" if env == "cpu" else None)
    if plat:
        import jax
        plat = {"cuda": "tpu", "mps": "cpu"}.get(plat, plat)
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            logger.warning("could not select platform %r; using default", plat)


def _mesh(n: int):
    if not n:
        return None
    import jax
    import numpy as np
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < n:
        logger.warning("requested mesh of %d devices but only %d available; using %d",
                       n, len(devs), len(devs))
        n = len(devs)
    return Mesh(np.array(devs[:n]), ("d",))


def _merizo_kw(args):
    return dict(
        iterate=args.iterate,
        length_conditional_iterate=args.length_conditional_iterate,
        max_iterations=args.max_iterations,
        shuffle_indices=args.shuffle_indices,
        min_domain_size=args.min_domain_size,
        min_fragment_size=args.min_fragment_size,
        domain_ave_size=args.domain_ave_size,
        conf_threshold=args.conf_threshold,
        save_pdb=args.save_pdb, save_domains=args.save_domains,
        save_fasta=args.save_fasta, save_pdf=args.save_pdf,
        return_indices=args.return_indices,
        conf_filter=args.conf_filter, plddt_filter=args.plddt_filter,
    )


def segment(argv):
    p = argparse.ArgumentParser(
        prog="merizo_tpu segment",
        description="Segment multidomain proteins into domains.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("input", type=str, nargs="+")
    p.add_argument("output", type=str,
                   help="Output prefix; results land in <output>_segment.tsv.")
    p.add_argument("-d", "--device", type=str, default=None)
    p.add_argument("-t", "--threads", type=int, default=-1)
    p.add_argument("--output_headers", action="store_true", default=False)
    _add_trace_flag(p)
    _add_merizo_flags(p)
    args = p.parse_args(argv)
    _apply_device(args.device)

    from .io.results import write_segment_results
    from .models.merizo.network import load_merizo_params
    from .segment.outputs import run_merizo
    from .utils import profiling

    out = args.output + "_segment.tsv"
    if os.path.exists(out):
        logger.warning("Segment output file '%s' already exists. Results will be overwritten!", out)
    t0 = time.time()
    with profiling.trace(args.trace):
        params = load_merizo_params(args.merizo_weights)
        chains = args.pdb_chain.rstrip(",").split(",")
        if len(chains) == 1:
            chains = chains * len(args.input)
        _, results = run_merizo(params, args.input, pdb_chains=chains,
                                merizo_output=args.merizo_output, **_merizo_kw(args))
        write_segment_results(results, out, header=args.output_headers)
    _finish("segment", t0)


def createdb(argv):
    p = argparse.ArgumentParser(
        prog="merizo_tpu createdb",
        description="Embed a directory of PDB files into a Foldclass database.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("input_dir", type=str)
    p.add_argument("out_db", type=str)
    p.add_argument("-d", "--device", type=str, default=None)
    p.add_argument("--db_format", type=str, default="pt", choices=["pt", "mmap"],
                   help="'pt' = reference small-DB layout; 'mmap' = large resumable layout.")
    p.add_argument("--precision", type=str, default=None,
                   choices=["int8", "bf16"],
                   help="Also write a quantised embedding sidecar (mmap layout "
                        "only) so streaming searches read 1 (int8) or 2 (bf16) "
                        "bytes/element from disk instead of 4. The fp32 file "
                        "stays authoritative for reference interop.")
    p.add_argument("--resume", action="store_true", default=False)
    p.add_argument("--weights", type=str, default=None)
    p.add_argument("--mesh", type=int, default=0,
                   help="Embed data-parallel across this many devices.")
    _add_trace_flag(p)
    args = p.parse_args(argv)
    if args.precision and args.db_format != "mmap":
        p.error("--precision requires --db_format mmap")
    _apply_device(args.device)
    _ensure_parent(args.out_db)

    from .pipeline.createdb import run_createdb
    from .utils import profiling

    t0 = time.time()
    with profiling.trace(args.trace):
        run_createdb(args.input_dir, args.out_db, weights=args.weights,
                     fmt=args.db_format, resume=args.resume,
                     mesh=_mesh(args.mesh), sidecar=args.precision)
    _finish("createdb", t0)


def _do_search(args, inputs, inputs_are_ca, pdb_chain, fields_default):
    from .io.results import (parse_output_format, write_search_results,
                             write_all_dom_search_results, check_for_database)
    from .pipeline.dbsearch import run_dbsearch
    from .pipeline.multidomain import multi_domain_search

    check_for_database(args.db_name)
    fields = parse_output_format(args.format, fields_default)
    search_output = args.output + "_search.tsv"
    for f, lbl in [(search_output, "Search"),
                   (args.output + "_search_insignificant.tsv", "Search")]:
        if os.path.exists(f):
            logger.warning("%s output file '%s' already exists. Results will be overwritten!", lbl, f)

    results, all_results = run_dbsearch(
        inputs, args.db_name, topk=args.topk, fastmode=args.fastmode,
        mincos=args.mincos, mintm=args.mintm, mincov=args.mincov,
        inputs_are_ca=inputs_are_ca, pdb_chain=pdb_chain,
        skip_tmalign=args.skip_tmalign, search_batchsize=args.search_batchsize,
        mesh=_mesh(args.mesh), weights=args.weights,
        tmalign_backend=args.tmalign_backend, threads=max(args.threads, 0),
        precision=args.precision, search_index=args.search_index,
        nprobe=args.nprobe, nlist=args.nlist, ivf_rerank=args.ivf_rerank,
        mmap_cov_filter=args.mmap_cov_filter)

    write_search_results(results, search_output, fields,
                         header=args.output_headers, metadata_json=args.metadata_json)
    if args.report_insignificant_hits:
        write_search_results(all_results, args.output + "_search_insignificant.tsv",
                             fields, header=args.output_headers,
                             metadata_json=args.metadata_json)
    if args.multi_domain_search:
        fl = multi_domain_search(
            inputs, results, args.db_name, fastmode=args.fastmode,
            mintm=args.mintm, inputs_from_easy_search=inputs_are_ca,
            mode=args.multi_domain_mode, weights=args.weights,
            tmalign_backend=args.tmalign_backend, threads=max(args.threads, 0))
        if fl is not None:
            write_all_dom_search_results(fl, args.output + "_search_multi_dom.tsv",
                                         args.output_headers)
    return results


def search(argv):
    from .io.results import SEARCH_FIELDS

    p = argparse.ArgumentParser(
        prog="merizo_tpu search",
        description="Search query PDBs against a Foldclass database.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("input", type=str, nargs="+")
    p.add_argument("db_name", type=str)
    p.add_argument("output", type=str)
    p.add_argument("tmp", type=str, nargs="?", default=None,
                   help="Accepted for reference-CLI parity; unused (no tmp files needed).")
    p.add_argument("--format", type=str, default=SEARCH_FIELDS)
    p.add_argument("--pdb_chain", type=str, default="A")
    _add_search_flags(p)
    _add_trace_flag(p)
    args = p.parse_args(argv)
    _fix_positional_tail(args)
    _apply_device(args.device)
    _ensure_parent(args.output)
    from .utils import profiling
    t0 = time.time()
    with profiling.trace(args.trace):
        _do_search(args, args.input, inputs_are_ca=False,
                   pdb_chain=args.pdb_chain, fields_default=SEARCH_FIELDS)
    _finish("search", t0)


def easy_search(argv):
    from .io.results import SEARCH_FIELDS, EASY_SEARCH_FIELDS, write_segment_results

    p = argparse.ArgumentParser(
        prog="merizo_tpu easy-search",
        description="Segment a multidomain chain and search it against a database.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("input", type=str, nargs="+")
    p.add_argument("db_name", type=str)
    p.add_argument("output", type=str)
    p.add_argument("tmp", type=str, nargs="?", default=None,
                   help="Accepted for reference-CLI parity; unused.")
    p.add_argument("--format", type=str, default=EASY_SEARCH_FIELDS)
    _add_search_flags(p)
    _add_trace_flag(p)
    _add_merizo_flags(p)
    args = p.parse_args(argv)
    _fix_positional_tail(args)
    _apply_device(args.device)
    _ensure_parent(args.output)

    from .models.merizo.network import load_merizo_params
    from .segment.outputs import run_merizo
    from .utils import profiling

    t0 = time.time()
    with profiling.trace(args.trace):
        seg_out = args.output + "_segment.tsv"
        if os.path.exists(seg_out):
            logger.warning("Segment output file '%s' already exists. Results will be overwritten!", seg_out)

        chains = args.pdb_chain.rstrip(",").split(",")
        if len(chains) == 1:
            chains = chains * len(args.input)

        params = load_merizo_params(args.merizo_weights)
        domains, seg_results = run_merizo(params, args.input, pdb_chains=chains,
                                          merizo_output=args.merizo_output,
                                          **_merizo_kw(args))
        write_segment_results(seg_results, seg_out, header=args.output_headers)

        if len(domains) == 0:
            logger.info("easy-search finished after segmentation. "
                        "Segmentation of this PDB file was not possible")
            _finish("easy-search", t0)
            return

        _do_search(args, domains, inputs_are_ca=True, pdb_chain=None,
                   fields_default=EASY_SEARCH_FIELDS)
    _finish("easy-search", t0)


def serve(argv):
    p = argparse.ArgumentParser(
        prog="merizo_tpu serve",
        description="Run a persistent search server: DB resident in device "
                    "HBM, models compiled once, queries over HTTP.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("db_name", type=str)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8086)
    p.add_argument("-d", "--device", type=str, default=None)
    p.add_argument("--mesh", type=int, default=0)
    p.add_argument("--precision", type=str, default="bf16",
                   choices=["fp32", "bf16", "int8"])
    p.add_argument("--weights", type=str, default=None)
    p.add_argument("--merizo_weights", type=str, default=None)
    p.add_argument("--tmalign_backend", type=str, default="auto",
                   choices=["auto", "native", "tpu"])
    p.add_argument("--search_index", type=str, default="flat",
                   choices=["flat", "ivf"])
    p.add_argument("--nprobe", type=int, default=32)
    p.add_argument("--nlist", type=int, default=0)
    p.add_argument("--ivf_rerank", action="store_true", default=False,
                   help="Exact f32 re-rank of the top probed blocks "
                        "(see search --help).")
    p.add_argument("--max_batch", type=int, default=64,
                   help="Dynamic micro-batching: concurrent /search requests "
                        "coalesce into batches up to this size (1 disables).")
    p.add_argument("--batch_window_ms", type=float, default=4.0,
                   help="Max time a /search request lingers for co-batched "
                        "requests.")
    args = p.parse_args(argv)
    _apply_device(args.device)

    from .server import serve as run_server

    run_server(args.db_name, host=args.host, port=args.port,
               mesh=_mesh(args.mesh), precision=args.precision,
               weights=args.weights, merizo_weights=args.merizo_weights,
               tmalign_backend=args.tmalign_backend,
               search_index=args.search_index, nprobe=args.nprobe,
               nlist=args.nlist, ivf_rerank=args.ivf_rerank,
               max_batch=args.max_batch,
               batch_window_ms=args.batch_window_ms)


USAGE = """Usage: python -m merizo_search_tpu.cli <mode> <args>
    <mode> is one of: 'segment', 'createdb', 'search', 'easy-search',
    'serve', or 'dbinfo'.
    Detailed help: python -m merizo_search_tpu.cli <mode> --help
"""


def dbinfo(argv):
    """Inspect / verify a Foldclass database (parity: the reference's
    standalone dbutil.py harness, dbutil.py:148-205, which prints name/seq
    per id as a manual consistency check of the mmap layout)."""
    p = argparse.ArgumentParser(
        prog="merizo_tpu dbinfo",
        description="Print database layout info and spot-check entries.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("db_name", type=str)
    p.add_argument("--ids", type=str, default=None,
                   help="Comma-separated entry ids to print (name, seq len, "
                        "coord shape, metadata).")
    p.add_argument("--verify", action="store_true", default=False,
                   help="Consistency-check every entry: seq/coord lengths "
                        "match, names decode, embeddings finite.")
    p.add_argument("--sample", type=int, default=1000,
                   help="With --verify: entries to check (0 = all).")
    p.add_argument("--write-sidecar", type=str, default=None,
                   choices=["int8", "bf16"], dest="write_sidecar",
                   help="Add a quantised embedding sidecar to an existing "
                        "mmap-layout DB (incl. reference-built ones) so "
                        "streaming searches read 1-2 bytes/element from disk.")
    args = p.parse_args(argv)

    import numpy as np
    from .db.codecs import FlatDB, write_quantized_sidecar

    if args.write_sidecar:
        if not os.path.exists(args.db_name + ".json"):
            p.error("--write-sidecar needs an mmap-layout DB "
                    f"({args.db_name}.json not found; .pt DBs are loaded "
                    "whole and quantised in memory, no sidecar needed)")
        write_quantized_sidecar(args.db_name, args.write_sidecar)

    db = FlatDB.open(args.db_name)
    emb = db.embeddings()
    print(f"format:     {db.kind}")
    print(f"entries:    {db.size}")
    print(f"dim:        {db.dim}")
    print(f"dtype:      {emb.dtype}")
    print(f"normalised: {db.normalised}")
    print(f"sidecars:   "
          f"{' '.join(k for k in ('int8', 'bf16') if db.has_quant(k)) or 'none'}")
    print(f"metadata:   {'yes' if getattr(db, '_meta_blob', None) else 'no'}")
    lens = db.lengths()
    print(f"lengths:    min {int(lens.min())}  median {int(np.median(lens))} "
          f" max {int(lens.max())}")

    if args.ids:
        for i in (int(x) for x in args.ids.split(",")):
            name, coords, seq = db.entry(i)
            print(f"[{i}] {name}  len={len(seq)}  coords={coords.shape}  "
                  f"meta={db.metadata(i)!r}")

    if args.verify:
        ids = np.arange(db.size)
        if args.sample and db.size > args.sample:
            ids = np.linspace(0, db.size - 1, args.sample).astype(np.int64)
        bad = 0
        for i in ids:
            try:
                name, coords, seq = db.entry(int(i))
                ok = (len(seq) == coords.shape[0] and coords.shape[1] == 3
                      and bool(np.isfinite(coords).all())
                      and bool(np.isfinite(np.asarray(emb[int(i)], np.float32)).all()))
            except Exception as e:
                logger.error("entry %d: %s", i, e)
                ok = False
            if not ok:
                bad += 1
                logger.error("entry %d (%s) failed consistency check", i,
                             db.name(int(i)) if hasattr(db, "name") else "?")
        print(f"verify:     {len(ids) - bad}/{len(ids)} entries OK")
        if bad:
            sys.exit(1)


def main(argv=None):
    setup_logging()
    enable_compilation_cache()
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print(USAGE)
        return
    mode, rest = argv[0], argv[1:]
    verbs = {"segment": segment, "createdb": createdb, "search": search,
             "easy-search": easy_search, "serve": serve, "dbinfo": dbinfo}
    if mode in ("-h", "--help"):
        print(USAGE)
        return
    if mode in ("-V", "--version"):
        from . import __version__
        print(f"merizo-search-tpu {__version__}")
        return
    if mode not in verbs:
        print("Invalid mode. Please choose one of 'segment', 'createdb', "
              "'search', 'easy-search', 'serve', or 'dbinfo'.")
        sys.exit(2)
    try:
        verbs[mode](rest)
    except FileNotFoundError as e:
        # a database with a present descriptor but missing payload files
        # (or a bad path) is a user-input error, not a crash: log-and-exit
        # like the reference (dbsearch.py:72)
        logger.error("missing file: %s", e)
        sys.exit(1)


if __name__ == "__main__":
    main()
