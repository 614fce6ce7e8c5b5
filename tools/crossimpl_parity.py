"""Cross-implementation end-to-end parity harness.

Runs the *reference* pipeline (torch CPU, /root/reference mirrored into a
writable workdir) and THIS package end-to-end on the same inputs with the
same seeded weights, then diffs the `_segment.tsv` / `_search.tsv` outputs
row by row. This is the strongest parity artifact available without the
trained weights: per-stage golden tests pin each network, and this harness
pins the full segment -> embed -> scan -> TM-align -> writer pipeline,
hit set and field values included.

What makes the reference runnable here:
- its TM-align binary is a stripped blob, so the harness builds the CLI
  shim (align/_native/tmalign_cli.cpp) around our clean-room aligner and
  drops it in as programs/Foldclass/tmalign — the reference's subprocess
  contract (Foldclass/utils.py:75-158) is satisfied, and because our
  pipeline's native backend is the same aligner, TSV diffs isolate
  pipeline-logic divergence rather than aligner differences;
- its trained weights are stripped, so both sides run the SAME seeded
  random state dicts (torch.manual_seed(0), the make_goldens convention),
  written as reference-format checkpoint files and loaded on our side
  through the production weight converters;
- `natsort` / `rotary_embedding_torch` are not installed, so a stubs dir
  with faithful stand-ins is prepended to the subprocess PYTHONPATH (the
  rotary convention is pinned by tests/test_rotary_convention.py).

Used by tests/test_crossimpl_parity.py; run standalone with
    python tools/crossimpl_parity.py [workdir]
"""

from __future__ import annotations

import csv
import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/merizo_search"
EXAMPLES = "/root/reference/examples"
NATIVE = os.path.join(REPO, "merizo_search_tpu", "align", "_native")

ROTARY_STUB = '''\
"""Faithful stand-in for rotary_embedding_torch (lucidrains), default path
only: theta=10000, positions along dim -2, interleaved pair rotation.
Convention pinned by tests/test_rotary_convention.py."""
import torch


class RotaryEmbedding(torch.nn.Module):
    def __init__(self, dim, theta=10000):
        super().__init__()
        inv = 1.0 / (theta ** (torch.arange(0, dim, 2).float() / dim))
        self.register_buffer("inv_freq", inv)

    def rotate_queries_or_keys(self, t, seq_dim=-2):
        seq_len = t.shape[seq_dim]
        pos = torch.arange(seq_len, dtype=self.inv_freq.dtype)
        freqs = torch.einsum("i,j->ij", pos, self.inv_freq)
        freqs = torch.repeat_interleave(freqs, 2, dim=-1)
        rot_dim = freqs.shape[-1]
        shape = [1] * t.ndim
        shape[seq_dim] = seq_len
        shape[-1] = rot_dim
        freqs = freqs.reshape(shape)
        t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
        x1 = t_rot[..., 0::2]
        x2 = t_rot[..., 1::2]
        half_rot = torch.stack((-x2, x1), dim=-1).reshape(t_rot.shape)
        t_rot = t_rot * freqs.cos() + half_rot * freqs.sin()
        return torch.cat((t_rot, t_pass), dim=-1)
'''

NATSORT_STUB = '''\
"""Minimal natural-sort stand-in for natsort (only natsorted is used,
model/utils/utils.py:541)."""
import re


def natsorted(xs, key=None):
    def nat(s):
        s = key(s) if key else s
        return [int(p) if p.isdigit() else p for p in re.split(r"(\\d+)", str(s))]
    return sorted(xs, key=nat)
'''


def _three_letter(seq_i: int) -> str:
    aas = ["ALA", "ARG", "ASN", "ASP", "CYS", "GLN", "GLU", "GLY", "HIS",
           "ILE", "LEU", "LYS", "MET", "PHE", "PRO", "SER", "THR", "TRP",
           "TYR", "VAL"]
    return aas[seq_i % 20]


def write_decoy_pdbs(out_dir: str, n: int = 16, seed: int = 7) -> list[str]:
    """Synthetic CA-only decoy structures (self-avoiding-ish random walks) in
    the reference's write_pdb format — DB filler so top-k ranking has
    non-trivial competition."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    paths = []
    for i in range(n):
        nres = int(rng.integers(60, 220))
        # wildly varied geometry (step length 1-12 A, optional compaction):
        # random-weight Foldclass embeds nearly collapse on same-scale
        # random walks (all pairwise cosines ~1.0), which makes top-k ranks
        # flip on float noise; diverse distance distributions separate the
        # embeddings so both implementations rank identically
        step_len = float(rng.uniform(1.0, 12.0))
        steps = rng.normal(size=(nres, 3))
        steps = steps / np.linalg.norm(steps, axis=1, keepdims=True) * step_len
        coords = np.cumsum(steps, axis=0) + rng.normal(size=3) * 10
        if i % 3 == 0:  # compact globule: re-scale toward the centroid
            coords = (coords - coords.mean(0)) * 0.4
        path = os.path.join(out_dir, f"decoy{i:03d}.pdb")
        with open(path, "w") as f:
            for j, (x, y, z) in enumerate(coords, start=1):
                aa = _three_letter(int(rng.integers(0, 20)))
                f.write(f"ATOM  {j: >5}  CA  {aa: >3} A{j: >4}    "
                        f"{x: >8.3f}{y: >8.3f}{z: >8.3f}  1.00  0.00\n")
            # standard 80-column END record: the reference's read_pdb
            # indexes line[21] before checking the record type
            # (Foldclass/utils.py:61), so a bare "END" raises IndexError
            f.write("END".ljust(80) + "\n")
        paths.append(path)
    return paths


def prepare(work: str) -> dict:
    """Mirror the reference into `work`, build the TM-align shim, write
    seeded weights for both sides, and prepare the stub dir. Returns paths."""
    ref_dir = os.path.join(work, "ref")
    if not os.path.exists(ref_dir):
        # datasets are large eval CSVs (and stripped zips) the pipeline never
        # reads; examples hold pre-computed goldens — neither is needed
        shutil.copytree(
            REF, ref_dir,
            ignore=shutil.ignore_patterns("datasets", "examples",
                                          "__pycache__"))
    stubs = os.path.join(work, "stubs")
    os.makedirs(stubs, exist_ok=True)
    with open(os.path.join(stubs, "rotary_embedding_torch.py"), "w") as f:
        f.write(ROTARY_STUB)
    with open(os.path.join(stubs, "natsort.py"), "w") as f:
        f.write(NATSORT_STUB)

    shim = os.path.join(ref_dir, "programs", "Foldclass", "tmalign")
    if not os.path.exists(shim):
        subprocess.run(
            ["g++", "-O3", "-o", shim,
             os.path.join(NATIVE, "tmalign_cli.cpp"),
             os.path.join(NATIVE, "tmalign.cpp"), "-lpthread"],
            check=True)

    fc_pt = os.path.join(ref_dir, "programs", "Foldclass",
                         "FINAL_foldclass_model.pt")
    mz_dir = os.path.join(ref_dir, "programs", "Merizo", "weights")
    os.makedirs(mz_dir, exist_ok=True)
    mz_pt = os.path.join(mz_dir, "weights_part_0.pt")
    if not (os.path.exists(fc_pt) and os.path.exists(mz_pt)):
        import torch
        sys.path.insert(0, stubs)
        sys.path.insert(0, ref_dir)
        try:
            from programs.Foldclass.nndef_fold_egnn_embed import FoldClassNet
            from programs.Merizo.model.network import Merizo
            torch.manual_seed(0)
            fc_net = FoldClassNet(128).eval()
            torch.save(fc_net.state_dict(), fc_pt)
            torch.manual_seed(0)
            mz_net = Merizo().eval()
            sd = mz_net.state_dict()
            # split into three files like the upstream release (merged back
            # by read_split_weight_files, predict.py:117-140, and by our
            # load_merizo_params)
            keys = list(sd.keys())
            for part in range(3):
                chunk = {k: sd[k] for k in keys[part::3]}
                torch.save(chunk, os.path.join(mz_dir,
                                               f"weights_part_{part}.pt"))
        finally:
            sys.path.remove(ref_dir)
            sys.path.remove(stubs)
    return {"work": work, "ref": ref_dir, "stubs": stubs,
            "foldclass_pt": fc_pt, "merizo_weights": mz_dir}


def run_reference(paths: dict, argv: list[str], timeout: int = 1800) -> str:
    """Run the mirrored reference CLI (merizo.py) in a subprocess."""
    env = dict(os.environ)
    env["PYTHONPATH"] = paths["stubs"]
    env["MPLBACKEND"] = "Agg"
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(paths["ref"], "merizo.py")] + argv,
        capture_output=True, text=True, timeout=timeout, env=env)
    if out.returncode != 0:
        raise RuntimeError(
            f"reference run failed ({argv[0]}):\n{out.stdout}\n{out.stderr}")
    return out.stdout + out.stderr


def run_ours(paths: dict, argv: list[str], timeout: int = 1800) -> str:
    """Run our CLI in a subprocess (CPU), pointing the weight flags at the
    seeded reference-format checkpoints so the converters are on-path."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    out = subprocess.run(
        [sys.executable, "-m", "merizo_search_tpu.cli"] + argv,
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO)
    if out.returncode != 0:
        raise RuntimeError(
            f"our run failed ({argv[0]}):\n{out.stdout}\n{out.stderr}")
    return out.stdout + out.stderr


def read_tsv(path: str) -> list[list[str]]:
    with open(path) as f:
        return [row for row in csv.reader(f, delimiter="\t")]


def canon_rows(rows: list[list[str]], float_tol: float = 5e-4,
               other: list[list[str]] | None = None) -> list[tuple]:
    """Canonicalise TSV rows for comparison: numeric fields are parsed so
    '1.0' == '1.00'; caller compares float fields with `float_tol`."""
    out = []
    for row in rows:
        parsed = []
        for field in row:
            try:
                parsed.append(("f", float(field)))
            except ValueError:
                parsed.append(("s", field))
        out.append(tuple(parsed))
    return out


def diff_tsvs(a_path: str, b_path: str, float_tol: float = 5e-4,
              skip_cols: tuple[int, ...] = ()) -> list[str]:
    """Row-by-row, field-by-field diff. Returns human-readable mismatch
    descriptions (empty = parity). Floats compare within float_tol (the
    two sides compute scores in different frameworks; TSVs print 4-5
    significant digits, so 5e-4 separates real divergence from print
    rounding)."""
    a, b = read_tsv(a_path), read_tsv(b_path)
    errs = []
    if len(a) != len(b):
        errs.append(f"row count: {len(a)} (reference) vs {len(b)} (ours)")
    for i, (ra, rb) in enumerate(zip(a, b)):
        if len(ra) != len(rb):
            errs.append(f"row {i}: field count {len(ra)} vs {len(rb)}")
            continue
        for j, (fa, fb) in enumerate(zip(ra, rb)):
            if j in skip_cols or fa == fb:
                continue
            try:
                va, vb = float(fa), float(fb)
                if abs(va - vb) <= float_tol * max(1.0, abs(va)):
                    continue
            except ValueError:
                pass
            errs.append(f"row {i} col {j}: {fa!r} vs {fb!r}")
    return errs


# segment-TSV wall-clock column (predict.py:252 'runtime'): the one field
# that legitimately differs between implementations
SEGMENT_RUNTIME_COL = 6


def compare_outputs(ref_out: str, our_out: str, prefix: str = "res",
                    segment: bool = True) -> list[str]:
    errs = []
    suffixes = ["_search.tsv", "_search_insignificant.tsv"]
    if segment:
        suffixes.insert(0, "_segment.tsv")
    for suffix in suffixes:
        ra = os.path.join(ref_out, prefix + suffix)
        rb = os.path.join(our_out, prefix + suffix)
        if not os.path.exists(ra) and not os.path.exists(rb):
            continue
        if os.path.exists(ra) != os.path.exists(rb):
            errs.append(f"{suffix}: exists only on "
                        f"{'reference' if os.path.exists(ra) else 'our'} side")
            continue
        skip = (SEGMENT_RUNTIME_COL,) if suffix == "_segment.tsv" else ()
        errs += [f"{suffix}: {e}" for e in diff_tsvs(ra, rb, skip_cols=skip)]
    return errs


def run_both_easy_search(paths: dict, query: str, db: str,
                         flags: list[str]) -> list[str]:
    """easy-search both sides; returns TSV diffs (segment + search)."""
    ref_out = os.path.join(paths["work"], "ref_easy")
    our_out = os.path.join(paths["work"], "our_easy")
    for d in (ref_out, our_out):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
    run_reference(paths, ["easy-search", query, db,
                          os.path.join(ref_out, "res"),
                          os.path.join(ref_out, "tmp"),
                          "--merizo_output", ref_out] + flags)
    run_ours(paths, ["easy-search", query, db,
                     os.path.join(our_out, "res"),
                     os.path.join(our_out, "tmp"),
                     "--merizo_output", our_out,
                     "--merizo_weights", paths["merizo_weights"],
                     "--weights", paths["foldclass_pt"],
                     # fp32 scan = the reference's compute dtype (torch
                     # F.cosine_similarity in f32); bf16 would flip ranks
                     # between near-tied scores
                     "--precision", "fp32",
                     "--tmalign_backend", "native"] + flags)
    return compare_outputs(ref_out, our_out)


def run_both_search(paths: dict, queries: list[str], db: str,
                    flags: list[str]) -> list[str]:
    """search mode both sides (queries read as domains, no Merizo): the
    embed -> scan -> TM-align -> writer leg with guaranteed significant
    hits when the queries are DB members (self-hit TM = 1)."""
    ref_out = os.path.join(paths["work"], "ref_search")
    our_out = os.path.join(paths["work"], "our_search")
    for d in (ref_out, our_out):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
    # explicit per-input chain list: the reference's single-chain broadcast
    # on this path is buggy (dbsearch.py:524 `[pdb_chains] * len(inputs)`
    # nests the list, so read_pdb compares line[21] == ['A'] and exits) —
    # matching chain counts sidestep the broadcast on both sides
    chains = ["--pdb_chain", ",".join(["A"] * len(queries))]
    run_reference(paths, ["search"] + queries
                  + [db, os.path.join(ref_out, "res"),
                     os.path.join(ref_out, "tmp")] + flags + chains)
    run_ours(paths, ["search"] + queries
             + [db, os.path.join(our_out, "res"),
                os.path.join(our_out, "tmp"),
                "--weights", paths["foldclass_pt"],
                "--precision", "fp32",
                "--tmalign_backend", "native"] + flags + chains)
    return compare_outputs(ref_out, our_out, segment=False)


def build_toy_db(paths: dict, extra: list[str], n_decoys: int = 24) -> str:
    """Reference-built .pt/.index toy DB over decoys + `extra` structures;
    BOTH pipelines then search the same DB bytes."""
    db_in = os.path.join(paths["work"], "db_in")
    write_decoy_pdbs(db_in, n=n_decoys)
    for p in extra:
        shutil.copy(p, db_in)
    db = os.path.join(paths["work"], "toydb")
    if not os.path.exists(db + ".pt"):
        run_reference(paths, ["createdb", db_in, db])
    return db


def main(work: str):
    os.makedirs(work, exist_ok=True)
    paths = prepare(work)
    query = os.path.join(EXAMPLES, "AF-Q96HM7-F1-model_v4.pdb")
    db = build_toy_db(paths, [query])
    flags = ["-k", "3", "-s", "-1.0", "--report_insignificant_hits",
             "--output_headers", "-t", "4"]
    print("== easy-search leg")
    errs = run_both_easy_search(paths, query, db, flags)
    print("easy-search:", "PARITY" if not errs else "DIVERGENCE")
    for e in errs[:20]:
        print("   ", e)
    nerr = len(errs)
    print("== search-mode leg")
    decoys = sorted(os.listdir(os.path.join(work, "db_in")))[:2]
    queries = [query] + [os.path.join(work, "db_in", d) for d in decoys]
    errs = run_both_search(paths, queries, db, flags)
    print("search:", "PARITY" if not errs else "DIVERGENCE")
    for e in errs[:20]:
        print("   ", e)
    return nerr + len(errs)


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1] if len(sys.argv) > 1
                       else "/tmp/crossimpl") else 0)
