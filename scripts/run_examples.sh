#!/bin/bash
# End-to-end smoke run over the bundled example structures (the reference's
# examples/README.md workflow): build a toy database from the example PDBs,
# then run every verb against it. Model weights are randomly initialised
# unless converted checkpoints are supplied via --weights/--merizo_weights,
# so outputs validate shapes/flow/formats, not biology.
#
# Usage: run_examples.sh <examples_dir> <output_dir>
#   e.g. run_examples.sh /root/reference/examples /tmp/examples_out

set -eu

EX=${1:?examples dir}
OUT=${2:?output dir}
mkdir -p "$OUT/pdbs"
cp "$EX"/*.pdb "$OUT/pdbs/"

CLI="python -m merizo_search_tpu.cli"

echo "== createdb (pt layout)"
$CLI createdb "$OUT/pdbs" "$OUT/toydb"

echo "== segment"
$CLI segment "$OUT/pdbs/3w5h.pdb" "$OUT/seg" --output_headers \
    --merizo_output "$OUT"

echo "== search"
$CLI search "$OUT/pdbs/AF-Q96HM7-F1-model_v4.pdb" "$OUT/toydb" "$OUT/res" \
    -k 3 --output_headers

echo "== easy-search (+ multi-domain)"
$CLI easy-search "$OUT/pdbs/AF-Q96PD2-F1-model_v4.pdb" "$OUT/toydb" \
    "$OUT/easy" -k 3 --output_headers --multi_domain_search \
    --merizo_output "$OUT"

echo "== outputs"
ls -l "$OUT"/*.tsv
