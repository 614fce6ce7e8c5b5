"""createdb: embed a directory of PDB files into a Foldclass database.

Reference: programs/Foldclass/makedb.py:34-94 — sequential, unbatched, writes
the pt layout only, and a crash restarts from scratch.

Here:
- structures are parsed with the vectorised CA reader, grouped into length
  buckets and embedded as masked batches (pipeline.embed);
- output can be the reference pt layout or the mmap layout (scales to DBs
  far larger than RAM);
- mmap builds are resumable: progress is the writer's entry count, and a
  restart with resume=True skips already-embedded files.
"""

from __future__ import annotations

import logging
import os
import time

import numpy as np

from ..io.pdb import read_ca
from ..db import codecs
from .embed import embed_structures, load_foldclass_params, MAX_RES

logger = logging.getLogger(__name__)


from ..utils.names import STRUCT_EXTS as EXTS, strip_struct_ext as _strip_ext


def list_pdb_files(input_dir: str) -> list[str]:
    files = [os.path.join(input_dir, f) for f in os.listdir(input_dir)
             if f.endswith(EXTS)]
    files.sort()  # parity: makedb.py:48 keeps runs deterministic
    return files


def run_createdb(input_dir: str, out_db: str, weights: str | None = None,
                 fmt: str = "pt", resume: bool = False,
                 chunk_files: int = 4096, params=None, mesh=None,
                 sidecar: str | None = None) -> int:
    """Build a database. Returns the number of entries written.

    fmt: "pt" (reference small-DB layout) or "mmap" (large, resumable).
    sidecar: "int8" or "bf16" adds a quantised embedding sidecar to an mmap
    build (codecs.write_quantized_sidecar) so streaming searches read 1-2
    bytes/element from disk instead of 4.
    """
    files = list_pdb_files(input_dir)
    logger.info("%d PDB files found in model directory. Will generate Foldclass database..", len(files))
    if params is None:
        params = load_foldclass_params(weights)

    import json

    progress_path = out_db + ".progress"
    skip_files = 0
    writer = None
    if fmt == "mmap":
        if resume and os.path.exists(progress_path):
            with open(progress_path) as fh:
                prog = json.load(fh)
            skip_files = int(prog.get("files_done", 0))
            # drop any entries written after the last progress checkpoint
            codecs.truncate_mmap_db(out_db, int(prog.get("entries", 0)))
            logger.info("resuming: %d files already consumed", skip_files)
        writer = codecs.MmapDBWriter(out_db, dim=128, append=resume and skip_files > 0)
    elif fmt != "pt":
        raise ValueError(f"unknown db format: {fmt}")

    all_embs, all_entries = [], []
    files_done = skip_files
    t0 = time.time()
    # process in file chunks so host memory stays bounded for huge inputs
    from concurrent.futures import ThreadPoolExecutor

    def _parse(path):
        try:
            return path, read_ca(path)
        except (ValueError, TypeError, KeyError, OSError, EOFError) as e:
            # malformed/truncated files must not abort an hours-long build
            logger.warning("unreadable structure file %s: %s", path, e)
            return path, None

    for c0 in range(skip_files, len(files), chunk_files):
        chunk = files[c0:min(c0 + chunk_files, len(files))]
        names, coords, seqs = [], [], []
        # the CA reader is numpy-kernel-bound and releases the GIL: parse on
        # a thread pool so file IO overlaps the previous chunk's embedding
        with ThreadPoolExecutor(max_workers=8) as ex:
            parsed = list(ex.map(_parse, chunk))
        for path, d in parsed:
            if d is None or len(d["coords"]) == 0:
                logger.warning("No CA atoms read from PDB file %s; skipping.", path)
                continue
            names.append(path)
            coords.append(d["coords"][:MAX_RES])
            seqs.append(d["seq"][:MAX_RES])

        if names:
            embs = embed_structures(params, coords, mesh=mesh)
            for j, name in enumerate(names):
                if fmt == "mmap":
                    writer.add(_strip_ext(os.path.basename(name)),
                               embs[j], coords[j], seqs[j])
                else:
                    all_embs.append(embs[j])
                    all_entries.append((name, coords[j], seqs[j]))
        files_done = min(c0 + chunk_files, len(files))
        if fmt == "mmap":
            with open(progress_path, "w") as fh:
                json.dump({"files_done": files_done, "total": len(files),
                           "entries": writer.count}, fh)
        logger.info("embedded %d/%d files (%.1fs)", files_done, len(files), time.time() - t0)

    if fmt == "mmap":
        writer.finalize()
        total = writer.count
        if sidecar:
            codecs.write_quantized_sidecar(out_db, sidecar)
    else:
        total = len(all_entries)
        if total == 0:
            raise ValueError("no embeddable structures found")
        codecs.write_pt_db(out_db, np.stack(all_embs), all_entries)
    logger.info("Output database contains %d PDBs.", total)
    return total
