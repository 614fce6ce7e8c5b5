"""Deployment installer smoke test (VERDICT r3 item 7).

Exercises scripts/install.sh end-to-end in --offline mode (no network, venv
reuses the host interpreter's site-packages): fresh install into a temp
prefix, entry-point runs, systemd unit generated, re-run is idempotent.
The online paths (DB download, jax[tpu], systemctl) shell out to the same
code with the offline guards off and are covered by docs/DEPLOY.md's
fresh-machine procedure.
"""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INSTALL = os.path.join(REPO, "scripts", "install.sh")


@pytest.fixture(scope="module")
def installed(tmp_path_factory):
    prefix = tmp_path_factory.mktemp("mtpu_install")
    r = subprocess.run(
        ["bash", INSTALL, "--offline", "--prefix", str(prefix), "--db",
         "none", "--serve-db", "/data/dbs/cath", "--mesh", "4"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    return prefix, r


def test_entry_point_runs(installed):
    prefix, _ = installed
    cli = prefix / "venv" / "bin" / "merizo-tpu"
    assert cli.exists()
    r = subprocess.run([str(cli), "--version"], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0
    assert "merizo-search-tpu" in (r.stdout + r.stderr)


def test_cli_help_all_verbs(installed):
    prefix, _ = installed
    cli = str(prefix / "venv" / "bin" / "merizo-tpu")
    for verb in ("segment", "createdb", "search", "easy-search", "serve",
                 "dbinfo"):
        r = subprocess.run([cli, verb, "--help"], capture_output=True,
                           text=True, timeout=120,
                           env={**os.environ, "JAX_PLATFORMS": "cpu"})
        assert r.returncode == 0, f"{verb}: {r.stderr}"


def test_systemd_unit_generated(installed):
    prefix, _ = installed
    unit = (prefix / "merizo-tpu.service").read_text()
    assert f"{prefix}/venv/bin/merizo-tpu serve /data/dbs/cath" in unit
    assert "--mesh 4" in unit
    assert f"MERIZO_TPU_CACHE={prefix}/cache" in unit
    assert "Restart=on-failure" in unit


def test_rerun_is_idempotent(installed):
    prefix, _ = installed
    r = subprocess.run(
        ["bash", INSTALL, "--offline", "--prefix", str(prefix), "--db",
         "none"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "reusing venv" in r.stdout
