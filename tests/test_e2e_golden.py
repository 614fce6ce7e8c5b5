"""Pinned end-to-end hit-set golden (VERDICT r2 item 4).

The reference's examples/README.md acceptance counts (12/17/7/28 hits) need
the trained weights and example DB payloads, which are stripped from
/root/reference. This test pins a deterministic substitute: the full
easy-search path — segment -> embed -> createdb -> scan -> TM-align rescore
-> writers — with the seeded random-weight models (PRNGKey(0) init, the
loader default) on the bundled example PDBs against a createdb-built toy DB,
asserting field-equality of the emitted TSVs against frozen goldens.

Any change to segmentation numerics, embedding numerics, the scan, the
rescoring, or the writers shows up as a golden diff. Regenerate with
REGEN_GOLDENS=1 python -m pytest tests/test_e2e_golden.py -q
after verifying a numerics change is intentional.

The runtime column of the segment TSV (reference predict.py:252 schema) is
masked before comparison; everything else must match exactly.
"""

import os
import shutil

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
REGEN = os.environ.get("REGEN_GOLDENS") == "1"


def _mask_times(text: str, col: int) -> str:
    out = []
    for ln in text.splitlines():
        f = ln.split("\t")
        if len(f) > col:
            f[col] = "T"
        out.append("\t".join(f))
    return "\n".join(out) + "\n"


def _check(path: str, golden_name: str, time_col: int | None = None):
    with open(path) as fh:
        got = fh.read()
    if time_col is not None:
        got = _mask_times(got, time_col)
    gpath = os.path.join(GOLDEN_DIR, golden_name)
    if REGEN:
        with open(gpath, "w") as fh:
            fh.write(got)
        return
    assert os.path.exists(gpath), f"golden {golden_name} missing; " \
        "run with REGEN_GOLDENS=1 to create it"
    with open(gpath) as fh:
        want = fh.read()
    assert got == want, f"{golden_name} drifted:\nGOT:\n{got}\nWANT:\n{want}"


@pytest.fixture(scope="module")
def toy_setup(tmp_path_factory, examples_dir):
    """createdb over the bundled example PDBs with the seeded embedder —
    both layouts (the pt path applies the reference's mincov prefilter, the
    mmap path replicates the reference faiss-path gap where it is absent,
    dbsearch.py:307-310, so their hit sets legitimately differ)."""
    root = tmp_path_factory.mktemp("e2e")
    pdbs = root / "pdbs"
    pdbs.mkdir()
    for f in os.listdir(examples_dir):
        if f.endswith(".pdb"):
            shutil.copy(os.path.join(examples_dir, f), pdbs / f)
    from merizo_search_tpu.cli import main

    db = str(root / "db" / "toy")
    main(["createdb", str(pdbs), db])
    dbmm = str(root / "dbmm" / "toy")
    main(["createdb", str(pdbs), dbmm, "--db_format", "mmap"])
    return root, db, dbmm


def test_easy_search_hitset_golden(toy_setup, examples_dir):
    root, db, dbmm = toy_setup
    from merizo_search_tpu.cli import main

    out = str(root / "out" / "res")
    main(["easy-search", os.path.join(examples_dir, "3w5h.pdb"), db, out,
          str(root / "tmp"), "-k", "3"])
    _check(out + "_segment.tsv", "e2e_segment.tsv", time_col=6)
    # pt path: the mincov prefilter excludes all whole-chain targets for
    # these ~110-residue query domains — the pinned golden is the EMPTY set
    _check(out + "_search.tsv", "e2e_search.tsv")

    outmm = str(root / "out" / "resmm")
    main(["easy-search", os.path.join(examples_dir, "3w5h.pdb"), dbmm, outmm,
          str(root / "tmpmm"), "-k", "3", "--multi_domain_search"])
    # mmap path: no mincov prefilter (reference parity) -> self-hits with
    # their cosine/TM fields frozen; the multi-domain MDA matcher runs on
    # the same hits and its TSV is frozen too
    _check(outmm + "_search.tsv", "e2e_search_mmap.tsv")
    md = outmm + "_search_multi_dom.tsv"
    if os.path.exists(md):
        _check(md, "e2e_multidom.tsv")
    else:
        assert not os.path.exists(
            os.path.join(GOLDEN_DIR, "e2e_multidom.tsv")), \
            "multi-domain TSV disappeared but its golden exists"


def test_search_mode_hitset_golden(toy_setup, examples_dir):
    """search mode (no segmentation): query structures embedded whole."""
    root, db, _ = toy_setup
    from merizo_search_tpu.cli import main

    out = str(root / "out" / "raw")
    main(["search", os.path.join(examples_dir, "AF-Q96HM7-F1-model_v4.pdb"),
          db, out, str(root / "tmp2"), "-k", "3"])
    _check(out + "_search.tsv", "e2e_rawsearch.tsv")


def test_mmap_cov_filter_matches_pt(toy_setup, examples_dir):
    """--mmap_cov_filter fixes the reference's faiss-path gap (mincov never
    implemented there, dbsearch.py:307-310): with the flag on, the mmap
    layout applies the same in-scan mincov mask + len_ali post-filter as the
    pt layout, so the two TSVs must be identical."""
    root, db, dbmm = toy_setup
    from merizo_search_tpu.cli import main

    qry = os.path.join(examples_dir, "AF-Q96HM7-F1-model_v4.pdb")
    out_pt = str(root / "out" / "cov_pt")
    out_mm = str(root / "out" / "cov_mm")
    main(["search", qry, db, out_pt, str(root / "tmp3"), "-k", "3"])
    main(["search", qry, dbmm, out_mm, str(root / "tmp4"), "-k", "3",
          "--mmap_cov_filter"])
    with open(out_pt + "_search.tsv") as fh:
        want = fh.read()
    with open(out_mm + "_search.tsv") as fh:
        got = fh.read()
    assert got == want
    # and without the flag the gap is preserved: same query self-hit is
    # still found (superset check — the unfiltered path can only add hits)
    out_nf = str(root / "out" / "cov_nf")
    main(["search", qry, dbmm, out_nf, str(root / "tmp5"), "-k", "3"])
    with open(out_nf + "_search.tsv") as fh:
        nf_lines = fh.read().splitlines()
    want_targets = {ln.split("\t")[2] for ln in want.splitlines() if ln}
    nf_targets = {ln.split("\t")[2] for ln in nf_lines if ln}
    assert want_targets <= nf_targets
