"""Unit tests for the TSV result writers (io/results.py).

Pin the exact field vocabulary, header names, ordering and numeric formats of
the reference's TSVs (programs/utils.py:8-185) so downstream consumers can
switch without changes.
"""

import json

import pytest

from merizo_search_tpu.io import results as rio


def _hit(**kw):
    base = {
        "query": "q1", "target": "cath123", "score": 0.87654,
        "q_len": 100, "t_len": 120,
        "tmalign_output": {"len_ali": 95, "rmsd": 2.345, "seq_id": 0.5,
                           "qtm": 0.81, "ttm": 0.72},
        "dom_str": "1-50_60-109", "dom_conf": 0.91234, "dom_plddt": 88.7,
        "metadata": "{ }",
    }
    base.update(kw)
    return base


def test_parse_output_format_accepts_subset():
    fields = rio.parse_output_format("query,target,max_tm", rio.SEARCH_FIELDS)
    assert fields == ["query", "target", "max_tm"]


def test_parse_output_format_rejects_unknown():
    with pytest.raises(ValueError):
        rio.parse_output_format("query,bogus", rio.SEARCH_FIELDS)


def test_write_search_results_format(tmp_path):
    out = str(tmp_path / "res.tsv")
    fields = rio.SEARCH_FIELDS.split(",")
    rio.write_search_results([{0: _hit()}], out, fields, header=True)
    lines = open(out).read().splitlines()
    assert lines[0].split("\t") == [
        "query", "emb_rank", "target", "emb_score", "q_len", "t_len",
        "ali_len", "seq_id", "q_tm", "t_tm", "max_tm", "rmsd", "metadata"]
    row = lines[1].split("\t")
    assert row == ["q1", "0", "cath123", "0.8765", "100", "120", "95",
                   "0.5000", "0.8100", "0.7200", "0.8100", "2.35", "{ }"]


def test_easy_search_header_renames_conf_plddt(tmp_path):
    out = str(tmp_path / "res.tsv")
    fields = rio.EASY_SEARCH_FIELDS.split(",")
    rio.write_search_results([{0: _hit()}], out, fields, header=True)
    head = open(out).read().splitlines()[0].split("\t")
    assert "dom_conf" in head and "dom_plddt" in head
    assert "conf" not in head and "plddt" not in head
    row = open(out).read().splitlines()[1].split("\t")
    assert row[1] == "1-50_60-109"          # chopping
    assert row[2] == "0.9123"               # dom_conf 4dp


def test_metadata_json_sidecar(tmp_path):
    out = str(tmp_path / "res.tsv")
    hit = _hit(metadata="{'cath_code': '3.40.50.720'}")
    rio.write_search_results([{0: hit}], out, ["query", "metadata"],
                             metadata_json=True)
    md = json.load(open(out + ".hit_metadata.json"))
    assert md == [{"cath_code": "3.40.50.720"}]


def test_write_segment_results(tmp_path):
    out = str(tmp_path / "seg.tsv")
    rio.write_segment_results([{
        "name": "foo.pdb", "length": 272, "nres_domain": 229,
        "nres_non_domain": 43, "num_domains": 2, "conf": 0.03066,
        "time": 1.23456, "dom_str": "1-10,11-20"}], out, header=True)
    lines = open(out).read().splitlines()
    assert lines[0] == "filename\tnres\tnres_dom\tnres_ndr\tndom\tpIoU\truntime\tresult"
    assert lines[1] == "foo\t272\t229\t43\t2\t0.0307\t1.2346\t1-10,11-20"


def test_write_all_dom_search_results(tmp_path):
    out = str(tmp_path / "md.tsv")
    rows = [("chainA", 2, "2pi4A", 2, 3, "d1:h1:0.8,d2:h2:0.7", "[{ },{ }]")]
    rio.write_all_dom_search_results(rows, out, header=True)
    lines = open(out).read().splitlines()
    assert lines[0].startswith("query_chain\tnqd\thit_chain")
    assert lines[1] == "chainA\t2\t2pi4A\t2\t3\td1:h1:0.8,d2:h2:0.7\t[{ },{ }]"


def test_check_for_database(tmp_path):
    with pytest.raises(FileNotFoundError):
        rio.check_for_database(str(tmp_path / "nope"))
    (tmp_path / "db.json").write_text("{}")
    rio.check_for_database(str(tmp_path / "db"))  # faiss layout: json suffices
