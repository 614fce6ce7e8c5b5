#!/bin/bash
# Fetch the published Foldclass databases (UCL Research Data Repository).
# Both layouts are read natively by merizo_search_tpu.db.codecs.FlatDB:
#   cath : .pt embeddings + pickled .index (+ metadata side files)
#   ted  : faiss-style {json, raw fp32 db, fixed-width names, (start,end)
#          index + blob} side-file layout (~1 TB total at TED-365M scale)
# Usage: download_dbs.sh <ted|cath> <output_dir>

set -eu

if [ "$#" -ne 2 ]; then
    echo "Usage: $0 <ted|cath> <output_dir>" >&2
    exit 2
fi

db=$1
out=$2
[ -d "$out" ] && [ -w "$out" ] || { echo "$out: not a writable directory" >&2; exit 1; }

# -c resumes partial files; --no-clobber is incompatible with -O (wget
# exits 1 when the file exists, which would abort the whole run under set -e)
W="wget -c --tries=0 --retry-connrefused"

case "$db" in
  ted)
    $W -O "$out/ted_365M_ca.db"              https://rdr.ucl.ac.uk/ndownloader/files/50817567
    $W -O "$out/ted_365M_ca.index"           https://rdr.ucl.ac.uk/ndownloader/files/50813403
    $W -O "$out/ted_365M.json"               https://rdr.ucl.ac.uk/ndownloader/files/50813226
    $W -O "$out/ted_365M_metadata.db"        https://rdr.ucl.ac.uk/ndownloader/files/51596447
    $W -O "$out/ted_365M_metadata.index"     https://rdr.ucl.ac.uk/ndownloader/files/51596228
    $W -O "$out/ted_365M_raw_128d.index_names" https://rdr.ucl.ac.uk/ndownloader/files/50813532
    $W -O "$out/ted_365M_raw_128d_norm.db"   https://rdr.ucl.ac.uk/ndownloader/files/50814849
    $W -O "$out/ted_365M_seq.db"             https://rdr.ucl.ac.uk/ndownloader/files/50813850
    $W -O "$out/ted_365M_seq.index"          https://rdr.ucl.ac.uk/ndownloader/files/50813406
    ;;
  cath)
    $W -O "$out/cath-4.3-foldclassdb.index"          https://rdr.ucl.ac.uk/ndownloader/files/50846196
    $W -O "$out/cath-4.3-foldclassdb.metadata"       https://rdr.ucl.ac.uk/ndownloader/files/51596162
    $W -O "$out/cath-4.3-foldclassdb.metadata.index" https://rdr.ucl.ac.uk/ndownloader/files/51596159
    $W -O "$out/cath-4.3-foldclassdb.pt"             https://rdr.ucl.ac.uk/ndownloader/files/50846193
    ;;
  *)
    echo "unknown db '$db' (expected 'ted' or 'cath')" >&2
    exit 1
    ;;
esac
