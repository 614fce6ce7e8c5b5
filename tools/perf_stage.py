"""Host staging throughput: read-copy bandwidth of a DB sidecar vs threads.

Sizes MERIZO_STAGE_THREADS for a deployment host: streaming search is
host-IO-bound at TED scale, and the staging pool only helps while the
disk/page-cache outruns one core's copy bandwidth. Run next to the DB:

    python tools/perf_stage.py <db_prefix> [block_rows=2097152]

Reads the int8 sidecar if present (the production streaming format), else
the fp32 embedding file, through the same FlatDB accessors the engine uses.
"""

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, "/root/repo")

from merizo_search_tpu.db import codecs


def main():
    prefix = sys.argv[1]
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 21
    db = codecs.FlatDB.open(prefix)
    kind = "int8" if db.has_quant("int8") else None
    itemsize = 1 if kind else 4

    def read(off):
        if kind:
            blk, _ = db.read_rows_quant(off, off + block, kind)
        else:
            blk = db.read_rows(off, off + block)
        # force page-in (sidecar reads return memmap views)
        return np.array(blk) if blk.base is not None else blk

    offs = list(range(0, db.size, block))
    total = db.size * db.dim * itemsize
    print(f"{prefix}: {db.size} rows, reading "
          f"{'int8 sidecar' if kind else 'fp32'} ({total/1e9:.2f} GB)")
    for threads in (1, 2, 3, 4, 6, 8):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            with ThreadPoolExecutor(threads) as ex:
                for _ in ex.map(read, offs):
                    pass
            best = min(best, time.perf_counter() - t0)
        print(f"  {threads} threads: {total/best/1e9:6.2f} GB/s")


if __name__ == "__main__":
    main()
