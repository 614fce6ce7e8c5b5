"""Score predicted domain choppings against a reference ground-truth CSV.

Usage:
  python tools/eval_segmentation.py <gt.csv> <pred_segment.tsv> [--tol 8] [--per-chain]

gt.csv: CATH-X.csv / AFDB-X.csv from the reference's
  programs/Merizo/datasets/merizo_domains/ (format: see that README).
pred_segment.tsv: a `merizo-tpu segment` / `easy-search` _segment.tsv.

Prints aggregate NDO-style overlap, domain-count accuracy and boundary F1.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from merizo_search_tpu.segment.evaluate import (evaluate, load_gt_csv,
                                                load_segment_tsv)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("gt_csv")
    p.add_argument("pred_tsv")
    p.add_argument("--tol", type=int, default=8,
                   help="Boundary match tolerance (residues).")
    p.add_argument("--per-chain", action="store_true")
    args = p.parse_args()

    res = evaluate(load_gt_csv(args.gt_csv), load_segment_tsv(args.pred_tsv),
                   tol=args.tol)
    per_chain = res.pop("per_chain", [])
    print(json.dumps(res, indent=2))
    if args.per_chain:
        for r in per_chain:
            print(f"{r['name']}\tndo={r['ndo_overlap']:.3f}\t"
                  f"count_match={r['count_match']}\tf1={r['boundary_f1']:.3f}")


if __name__ == "__main__":
    main()
