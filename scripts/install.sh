#!/bin/bash
# One-command installer for merizo-search-tpu.
#
# TPU-native counterpart of the reference's ansible installer
# (reference ansible_installer/install.yml + roles/merizosearch/tasks/main.yml:
# git clone + virtualenv + pip requirements + faiss) — with the extra steps a
# production TPU deployment needs: database download, converted-weights
# wiring, a smoke check, and a systemd unit for `merizo-tpu serve`.
# No conda and no faiss: the engine is pure JAX + NumPy, and the native
# TM-align library self-compiles with g++ on first use.
#
# Usage:
#   scripts/install.sh [options]
#
# Options:
#   --prefix DIR    install root (default /opt/merizo-tpu; venv at PREFIX/venv)
#   --source DIR    package checkout to install (default: this script's repo)
#   --db cath|ted|none
#                   database to download into --data (default none)
#   --data DIR      database directory (default PREFIX/dbs)
#   --weights DIR   directory holding trained reference weights to wire up:
#                   FINAL_foldclass_model.pt and/or weights_part_{0,1,2}.pt
#   --weights-from-upstream
#                   clone the public upstream repo (psipred/merizo_search,
#                   which carries the trained split weights in-tree) into
#                   PREFIX/upstream, wire its weights_part_{0,1,2}.pt +
#                   FINAL_foldclass_model.pt, and run the real-weights
#                   acceptance gate (tests/test_reference_acceptance.py:
#                   the reference's published example hit counts) as the
#                   post-install smoke — a one-command path from bare host
#                   to a PASSED acceptance. Needs network + git.
#   --tpu           also install jax[tpu] from the libtpu release index
#   --systemd       write + enable a merizo-tpu.service systemd unit
#                   (requires the DB; unit is always *generated* under PREFIX)
#   --serve-db NAME db prefix the service should load (default: the one
#                   downloaded by --db, else required with --systemd)
#   --port N        serve port for the unit (default 8086)
#   --mesh N        serve mesh size for the unit (default 0 = single chip)
#   --offline       no network: venv reuses system site-packages, package is
#                   installed with --no-deps/--no-build-isolation, no DB
#                   download, no jax[tpu]
#
# Idempotent: re-running upgrades the package in place and leaves existing
# databases alone (downloads resume partial files).

set -euo pipefail

PREFIX=/opt/merizo-tpu
SOURCE="$(cd "$(dirname "$0")/.." && pwd)"
DB=none
DATA=""
WEIGHTS=""
TPU=0
SYSTEMD=0
SERVE_DB=""
PORT=8086
MESH=0
OFFLINE=0
UPSTREAM_WEIGHTS=0
UPSTREAM_URL=${MERIZO_UPSTREAM_URL:-https://github.com/psipred/merizo_search}

while [ "$#" -gt 0 ]; do
    case "$1" in
        --prefix)   PREFIX=$2; shift 2 ;;
        --source)   SOURCE=$2; shift 2 ;;
        --db)       DB=$2; shift 2 ;;
        --data)     DATA=$2; shift 2 ;;
        --weights)  WEIGHTS=$2; shift 2 ;;
        --tpu)      TPU=1; shift ;;
        --systemd)  SYSTEMD=1; shift ;;
        --serve-db) SERVE_DB=$2; shift 2 ;;
        --port)     PORT=$2; shift 2 ;;
        --mesh)     MESH=$2; shift 2 ;;
        --offline)  OFFLINE=1; shift ;;
        --weights-from-upstream) UPSTREAM_WEIGHTS=1; shift ;;
        -h|--help)  sed -n '2,40p' "$0" | sed 's/^# \{0,1\}//'; exit 0 ;;
        *) echo "unknown option: $1 (try --help)" >&2; exit 2 ;;
    esac
done

DATA=${DATA:-$PREFIX/dbs}
VENV=$PREFIX/venv
PY=$VENV/bin/python
log() { echo "[install] $*"; }

[ -f "$SOURCE/pyproject.toml" ] || {
    echo "--source $SOURCE does not look like a merizo-search-tpu checkout" >&2
    exit 1; }

mkdir -p "$PREFIX" "$DATA" "$PREFIX/cache"

# 1. virtualenv (reference role: "Initiate virtualenv"). Offline installs
# make the invoking interpreter's site-packages visible in the new venv via
# a .pth file: --system-site-packages alone is not enough when python3 is
# itself a venv (venv-in-venv rebases on the bare interpreter, losing the
# outer venv's packages — jax/numpy/setuptools would vanish).
if [ ! -x "$PY" ]; then
    log "creating venv at $VENV"
    python3 -m venv --system-site-packages "$VENV"
else
    log "reusing venv at $VENV"
fi
if [ "$OFFLINE" = 1 ]; then
    HOST_SITE=$(python3 -c "import sysconfig; print(sysconfig.get_paths()['purelib'])")
    VENV_SITE=$("$PY" -c "import sysconfig; print(sysconfig.get_paths()['purelib'])")
    echo "$HOST_SITE" > "$VENV_SITE/_merizo_host_site.pth"
    log "offline: linked host site-packages ($HOST_SITE)"
fi

# 2. package install (reference role: "Install requirements")
log "installing merizo-search-tpu from $SOURCE"
if [ "$OFFLINE" = 1 ]; then
    "$PY" -m pip install --quiet --no-deps --no-build-isolation "$SOURCE"
else
    "$PY" -m pip install --quiet --upgrade pip
    "$PY" -m pip install --quiet "$SOURCE[torch,plots]"
    if [ "$TPU" = 1 ]; then
        log "installing jax[tpu]"
        "$PY" -m pip install --quiet 'jax[tpu]' \
            -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
    fi
fi
"$VENV/bin/merizo-tpu" --version >/dev/null
log "package OK: $("$VENV/bin/merizo-tpu" --version 2>&1)"

# 3. trained weights (optional; the models run with seeded random weights
# when absent, which segments/search but is only useful for smoke tests)
#
# --weights-from-upstream: fetch the real checkpoints from the public
# upstream repository, which ships the 3-way-split Merizo weights and the
# Foldclass model in-tree (reference predict.py:117-140 merges the split;
# reference ansible_installer clones the same repo). A shallow clone is
# enough; re-runs reuse it.
if [ "$UPSTREAM_WEIGHTS" = 1 ]; then
    if [ "$OFFLINE" = 1 ]; then
        echo "--weights-from-upstream conflicts with --offline" >&2; exit 2
    fi
    UP=$PREFIX/upstream
    if [ ! -d "$UP/.git" ]; then
        log "cloning upstream weights repo: $UPSTREAM_URL"
        git clone --depth 1 "$UPSTREAM_URL" "$UP"
    else
        log "reusing upstream clone at $UP (git -C $UP pull to refresh)"
    fi
    UPW=$PREFIX/weights-upstream
    mkdir -p "$UPW"
    # weight files live under merizo_search/programs/... in-tree; locate by
    # name so upstream reorganisations don't break the wiring
    find "$UP" -name 'weights_part_*.pt' -exec cp -f {} "$UPW/" \;
    find "$UP" -name 'FINAL_foldclass_model.pt' -exec cp -f {} "$UPW/" \;
    ls "$UPW"/weights_part_*.pt >/dev/null 2>&1 || {
        echo "upstream clone has no weights_part_*.pt — repo layout changed?" >&2
        exit 1; }
    [ -f "$UPW/FINAL_foldclass_model.pt" ] || {
        echo "upstream clone has no FINAL_foldclass_model.pt" >&2; exit 1; }
    WEIGHTS=$UPW
    # example DBs for the acceptance gate (toy CATH .pt/.index + the
    # ted100_9606_small side files), if the clone carries them
    UPDB=$(dirname "$(find "$UP" -name 'cath*.index' -print -quit 2>/dev/null)" \
           2>/dev/null || true)
fi
WFLAGS=()
if [ -n "$WEIGHTS" ]; then
    mkdir -p "$PREFIX/weights"
    found=0
    if [ -f "$WEIGHTS/FINAL_foldclass_model.pt" ]; then
        cp -f "$WEIGHTS/FINAL_foldclass_model.pt" "$PREFIX/weights/"
        WFLAGS+=(--weights "$PREFIX/weights/FINAL_foldclass_model.pt")
        found=1
    fi
    if ls "$WEIGHTS"/weights_part_*.pt >/dev/null 2>&1; then
        mkdir -p "$PREFIX/weights/merizo"
        cp -f "$WEIGHTS"/weights_part_*.pt "$PREFIX/weights/merizo/"
        WFLAGS+=(--merizo_weights "$PREFIX/weights/merizo")
        found=1
    fi
    [ "$found" = 1 ] || log "WARNING: no recognised weight files in $WEIGHTS"
fi

# 3b. real-weights acceptance gate (the post-install smoke when upstream
# weights were fetched): re-runs the reference's published example numbers
# (12/17/7/28 hits, 2/1/2 domains — reference examples/README.md:3-20)
# through THIS pipeline. A PASS certifies the install end-to-end: weight
# conversion, segmentation, embedding, scan, TM-align, writers.
if [ "$UPSTREAM_WEIGHTS" = 1 ]; then
    ACC_DB=${UPDB:-}
    # prefer an examples/database dir with the cath.pt symlink layout
    CAND=$(find "$PREFIX/upstream" -type d -path '*examples/database' -print -quit 2>/dev/null || true)
    [ -n "$CAND" ] && ACC_DB=$CAND
    if [ -z "$ACC_DB" ] || [ ! -e "$ACC_DB/cath.pt" ]; then
        log "WARNING: upstream clone lacks the example DBs; acceptance gate"
        log "         will SKIP its db-dependent cases"
    fi
    log "running real-weights acceptance gate"
    if ! (cd "$SOURCE" && \
          MERIZO_TPU_MERIZO_WEIGHTS="$PREFIX/weights/merizo" \
          MERIZO_TPU_FOLDCLASS_WEIGHTS="$PREFIX/weights/FINAL_foldclass_model.pt" \
          MERIZO_TPU_EXAMPLES_DB="${ACC_DB:-/nonexistent}" \
          "$PY" -m pytest tests/test_reference_acceptance.py -q -rs); then
        echo "ACCEPTANCE GATE FAILED — install is not certified" >&2
        exit 1
    fi
    log "acceptance gate PASSED"
fi

# 4. database download (reference: download_dbs.sh; resumes partials)
case "$DB" in
    none) ;;
    cath|ted)
        if [ "$OFFLINE" = 1 ]; then
            echo "--db $DB conflicts with --offline" >&2; exit 2
        fi
        log "downloading $DB database into $DATA"
        "$SOURCE/scripts/download_dbs.sh" "$DB" "$DATA"
        case "$DB" in
            cath) SERVE_DB=${SERVE_DB:-$DATA/cath-4.3-foldclassdb} ;;
            ted)  SERVE_DB=${SERVE_DB:-$DATA/ted_365M} ;;
        esac
        log "verifying database layout"
        "$VENV/bin/merizo-tpu" dbinfo "$SERVE_DB" --verify
        ;;
    *) echo "unknown --db '$DB' (cath|ted|none)" >&2; exit 2 ;;
esac

# 5. systemd unit for the search server (always generated; installed and
# enabled only with --systemd, which needs root and a database)
UNIT=$PREFIX/merizo-tpu.service
SERVE_ARGS="--port $PORT --mesh $MESH"
[ ${#WFLAGS[@]} -gt 0 ] && SERVE_ARGS="$SERVE_ARGS ${WFLAGS[*]}"
cat > "$UNIT" <<EOF
[Unit]
Description=merizo-tpu search server
After=network.target

[Service]
ExecStart=$VENV/bin/merizo-tpu serve ${SERVE_DB:-/data/dbs/SET_ME} $SERVE_ARGS
Environment=MERIZO_TPU_CACHE=$PREFIX/cache
Restart=on-failure
LimitNOFILE=65536

[Install]
WantedBy=multi-user.target
EOF
log "wrote systemd unit: $UNIT"
if [ "$SYSTEMD" = 1 ]; then
    if [ -z "$SERVE_DB" ]; then
        echo "--systemd needs a database (--db cath|ted or --serve-db)" >&2
        exit 2
    fi
    cp -f "$UNIT" /etc/systemd/system/merizo-tpu.service
    systemctl daemon-reload
    systemctl enable --now merizo-tpu.service
    log "service enabled: systemctl status merizo-tpu"
fi

log "done."
log "  CLI:    $VENV/bin/merizo-tpu {segment,createdb,search,easy-search,serve,dbinfo}"
[ -n "$SERVE_DB" ] && log "  serve:  $VENV/bin/merizo-tpu serve $SERVE_DB $SERVE_ARGS"
log "  cache:  export MERIZO_TPU_CACHE=$PREFIX/cache  (persistent XLA + native builds)"
