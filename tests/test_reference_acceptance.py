"""Real-weights acceptance gate (VERDICT r3 item 8).

The reference publishes acceptance numbers for its bundled examples
(reference examples/README.md:3-20): at -k 10,

    3w5h.pdb            -> 2 domains, 12 significant hits vs the CATH toy db
    3w5h.pdb            -> 17 significant hits vs the ted100_9606_small db
    AF-Q96HM7-F1 (v4)   -> 1 domain,  7 hits vs ted100_9606_small
    AF-Q96PD2-F1 (v4)   -> 2 domains, 28 hits vs ted100_9606_small
    M0.pdb              -> must fail to segment (0 domains)

Those runs need the trained Merizo/Foldclass weights and the example DB
payloads, all of which are stripped from the /root/reference mirror
(.MISSING_LARGE_BLOBS:1-17). This module SKIPS cleanly when they are absent
and runs the full acceptance when they are supplied, either by restoring the
blobs in place or via environment overrides:

    MERIZO_TPU_MERIZO_WEIGHTS     dir holding weights_part_{0,1,2}.pt
    MERIZO_TPU_FOLDCLASS_WEIGHTS  path to FINAL_foldclass_model.pt
    MERIZO_TPU_EXAMPLES_DB        dir holding the cath.pt/.index pair and the
                                  ted100_9606_small side files (defaults to
                                  /root/reference/examples/database)

Hit counting matches the reference's definition of "significant": rows
written to <out>_search.tsv (hits whose best TM-score >= mintm=0.5,
reference dbsearch.py:163-198); domain counts come from the nres_domain
column of <out>_segment.tsv (reference predict.py:238-263 schema).
"""

import os

import pytest

REF = "/root/reference"


def _env(name, default):
    return os.environ.get(name, default)


MERIZO_W = _env("MERIZO_TPU_MERIZO_WEIGHTS",
                os.path.join(REF, "merizo_search/programs/Merizo/weights"))
FOLDCLASS_W = _env(
    "MERIZO_TPU_FOLDCLASS_WEIGHTS",
    os.path.join(REF, "merizo_search/programs/Foldclass/FINAL_foldclass_model.pt"))
DB_DIR = _env("MERIZO_TPU_EXAMPLES_DB", os.path.join(REF, "examples/database"))


def _have_weights() -> bool:
    if not os.path.isfile(FOLDCLASS_W):
        return False
    if not os.path.isdir(MERIZO_W):
        return False
    parts = [f for f in os.listdir(MERIZO_W)
             if f.startswith("weights_part_") and f.endswith(".pt")]
    return len(parts) >= 3


def _have_cath_db() -> bool:
    return all(os.path.isfile(os.path.join(DB_DIR, "cath" + ext))
               for ext in (".pt", ".index"))


def _have_ted_db() -> bool:
    # the json descriptor + every payload it names (the mirror keeps the
    # small index/name files but strips the .db payloads)
    need = ["ted100.json", "ted100_raw_128d_norm.db", "ted100_ca.db",
            "ted100_ca.index", "ted100_raw_128d.index_names",
            "ted100_seq.db", "ted100_seq.index"]
    return all(os.path.exists(os.path.join(DB_DIR, f)) for f in need)


requires_weights = pytest.mark.skipif(
    not _have_weights(),
    reason="trained Merizo/Foldclass weights not present (stripped from the "
           "mirror; set MERIZO_TPU_MERIZO_WEIGHTS / "
           "MERIZO_TPU_FOLDCLASS_WEIGHTS to run the acceptance gate)")


def _run_easy_search(tmp_path, examples_dir, query, db, tag):
    from merizo_search_tpu.cli import main

    out = str(tmp_path / tag / "res")
    main(["easy-search", os.path.join(examples_dir, query), db, out,
          str(tmp_path / tag / "tmp"), "-k", "10",
          "--merizo_weights", MERIZO_W, "--weights", FOLDCLASS_W])
    return out


def _count_hits(out_prefix: str) -> int:
    path = out_prefix + "_search.tsv"
    if not os.path.exists(path):
        return 0
    with open(path) as fh:
        return sum(1 for ln in fh if ln.strip())


def _domain_count(out_prefix: str, query_stem: str) -> int:
    with open(out_prefix + "_segment.tsv") as fh:
        for ln in fh:
            f = ln.rstrip("\n").split("\t")
            if f and f[0] == query_stem:
                return int(f[4])
    raise AssertionError(f"{query_stem} missing from segment TSV")


@requires_weights
@pytest.mark.skipif(not _have_cath_db(), reason="cath example DB payload "
                    "stripped (set MERIZO_TPU_EXAMPLES_DB)")
def test_3w5h_vs_cath(tmp_path, examples_dir):
    out = _run_easy_search(tmp_path, examples_dir, "3w5h.pdb",
                           os.path.join(DB_DIR, "cath"), "cath")
    assert _domain_count(out, "3w5h") == 2
    assert _count_hits(out) == 12


@requires_weights
@pytest.mark.skipif(not _have_ted_db(), reason="ted100 example DB payload "
                    "stripped (set MERIZO_TPU_EXAMPLES_DB)")
@pytest.mark.parametrize("query,stem,ndom,nhits", [
    ("3w5h.pdb", "3w5h", 2, 17),
    ("AF-Q96HM7-F1-model_v4.pdb", "AF-Q96HM7-F1-model_v4", 1, 7),
    ("AF-Q96PD2-F1-model_v4.pdb", "AF-Q96PD2-F1-model_v4", 2, 28),
])
def test_ted100_acceptance(tmp_path, examples_dir, query, stem, ndom, nhits):
    out = _run_easy_search(tmp_path, examples_dir, query,
                           os.path.join(DB_DIR, "ted100"), stem)
    assert _domain_count(out, stem) == ndom
    assert _count_hits(out) == nhits


@requires_weights
def test_m0_fails_to_segment(tmp_path, examples_dir):
    """M0.pdb must yield zero domains (reference README.md:131) — the
    pipeline warns and produces no searchable domains for it."""
    from merizo_search_tpu.models.merizo.network import load_merizo_params
    from merizo_search_tpu.segment.outputs import run_merizo

    params = load_merizo_params(MERIZO_W)
    domains, _ = run_merizo(params, [os.path.join(examples_dir, "M0.pdb")],
                            merizo_output=str(tmp_path / "m0out"))
    assert domains == []
