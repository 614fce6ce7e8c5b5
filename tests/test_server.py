"""Tests for the persistent search server (server.py).

Spins up the HTTP server in a background thread against a small synthetic
database and drives /healthz, /search, /easy-search and /stats through a
real HTTP client.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from merizo_search_tpu.db import codecs
from merizo_search_tpu import server as srv


@pytest.fixture(scope="module")
def running_server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("srvdb")
    rng = np.random.default_rng(0)
    from merizo_search_tpu.pipeline.embed import load_foldclass_params, embed_structures

    params = load_foldclass_params(None)
    coords = [np.cumsum(rng.normal(size=(60 + 10 * i, 3)) * 1.8, axis=0)
              .astype(np.float32) for i in range(5)]
    embs = embed_structures(params, coords)
    entries = [(f"t{i}", c, "A" * len(c)) for i, c in enumerate(coords)]
    prefix = str(tmp / "db")
    codecs.write_pt_db(prefix, embs, entries)

    service = srv.SearchService(prefix, precision="fp32")
    service.fc_params = params  # same weights the DB was built with
    httpd = srv.ThreadingHTTPServer(("127.0.0.1", 0), srv.make_handler(service))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, coords
    httpd.shutdown()


def _post(base, path, obj):
    req = urllib.request.Request(
        base + path, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def _get(base, path):
    with urllib.request.urlopen(base + path) as resp:
        return json.loads(resp.read())


def test_healthz(running_server):
    base, _ = running_server
    h = _get(base, "/healthz")
    assert h["status"] == "ok"
    assert h["db_size"] == 5


def test_search_self_hit(running_server):
    base, coords = running_server
    r = _post(base, "/search", {
        "coords": coords[2].tolist(), "seq": "A" * len(coords[2]),
        "k": 3, "mincos": 0.2, "mintm": 0.3})
    assert r["hits"], "self query must hit"
    top = r["hits"][0]
    assert top["target"] == "t2"
    assert top["emb_score"] > 0.99
    assert top["q_tm"] > 0.99


def test_search_skip_tmalign(running_server):
    base, coords = running_server
    r = _post(base, "/search", {
        "coords": coords[0].tolist(), "k": 2, "mincos": 0.0,
        "skip_tmalign": True})
    assert len(r["hits"]) >= 1
    assert r["hits"][0]["q_tm"] is None


def test_bad_request(running_server):
    base, _ = running_server
    req = urllib.request.Request(base + "/search", data=b"{}",
                                 headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_stats(running_server):
    base, _ = running_server
    s = _get(base, "/stats")
    assert s["db_size"] == 5
    assert s["requests"] >= 2
    assert "db_scan" in s["phase_timings"]
