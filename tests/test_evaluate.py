"""Tests for the segmentation evaluation harness (segment/evaluate.py),
covering the reference datasets' ground-truth chopping grammar
(datasets/merizo_domains/README) and the scoring metrics."""

import numpy as np

from merizo_search_tpu.segment import evaluate as ev


def test_parse_gt_chopping_discontinuous_and_mask():
    doms = ev.parse_gt_chopping("100-129_168-292:40_1078|1-99_130-167:40_1078")
    assert len(doms) == 2
    assert 100 in doms[0] and 168 in doms[0] and 130 not in doms[0]
    assert 1 in doms[1] and 130 in doms[1]
    # holding-pen domains are dropped
    doms = ev.parse_gt_chopping("1-50:1_2|51-99:999_999")
    assert len(doms) == 1


def test_parse_pred_chopping():
    doms = ev.parse_pred_chopping("1001-1023_1039-1073,1024-1038")
    assert len(doms) == 2
    assert 1001 in doms[0] and 1039 in doms[0] and 1024 not in doms[0]
    assert ev.parse_pred_chopping("na") == []
    assert ev.parse_pred_chopping("") == []


def test_score_identical_chopping_is_perfect():
    true = ev.parse_gt_chopping("1-100:1_1|101-200:2_2")
    pred = ev.parse_pred_chopping("1-100,101-200")
    s = ev.score_chopping(pred, true)
    assert s["ndo_overlap"] == 1.0
    assert s["count_match"] and s["boundary_f1"] == 1.0


def test_score_shifted_boundary():
    true = ev.parse_gt_chopping("1-100:1_1|101-200:2_2")
    pred = ev.parse_pred_chopping("1-95,96-200")  # boundary off by 5
    s = ev.score_chopping(pred, true, tol=8)
    assert 0.9 < s["ndo_overlap"] < 1.0
    assert s["count_match"]
    assert s["boundary_f1"] == 1.0  # within tolerance
    s2 = ev.score_chopping(pred, true, tol=2)
    assert s2["boundary_f1"] < 1.0


def test_score_wrong_count_and_empty():
    true = ev.parse_gt_chopping("1-100:1_1|101-200:2_2")
    pred = ev.parse_pred_chopping("1-200")
    s = ev.score_chopping(pred, true)
    assert not s["count_match"]
    assert 0.4 < s["ndo_overlap"] <= 0.55  # one domain fully matched
    assert ev.score_chopping([], true)["ndo_overlap"] == 0.0
    assert ev.score_chopping([], [])["ndo_overlap"] == 1.0


def test_evaluate_against_reference_csv_row():
    # a real row shape from CATH-663.csv
    import io, csv, tempfile, os
    row = '19hc,19hcA,A,2,1,292,100-129_168-292:40_1078|1-99_130-167:40_1078\n'
    with tempfile.TemporaryDirectory() as d:
        gt_path = os.path.join(d, "gt.csv")
        open(gt_path, "w").write(row)
        gt = ev.load_gt_csv(gt_path)
        assert "19hcA" in gt and len(gt["19hcA"]) == 2
        tsv = os.path.join(d, "pred_segment.tsv")
        open(tsv, "w").write(
            "19hcA\t292\t292\t0\t2\t0.9\t0.1\t100-129_168-292,1-99_130-167\n")
        res = ev.evaluate(gt, ev.load_segment_tsv(tsv))
        assert res["n"] == 1
        assert res["ndo_overlap_mean"] == 1.0
        assert res["count_accuracy"] == 1.0
