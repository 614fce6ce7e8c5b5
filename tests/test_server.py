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


@pytest.fixture(scope="module")
def service_db(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("batchdb")
    rng = np.random.default_rng(1)
    from merizo_search_tpu.pipeline.embed import load_foldclass_params, embed_structures

    params = load_foldclass_params(None)
    coords = [np.cumsum(rng.normal(size=(60 + 10 * i, 3)) * 1.8, axis=0)
              .astype(np.float32) for i in range(6)]
    embs = embed_structures(params, coords)
    entries = [(f"t{i}", c, "A" * len(c)) for i, c in enumerate(coords)]
    prefix = str(tmp / "db")
    codecs.write_pt_db(prefix, embs, entries)
    return prefix, coords


def test_concurrent_searches_microbatch(service_db):
    """Concurrent /search requests with identical options coalesce into
    fewer engine dispatches (dynamic micro-batching) and return exactly the
    per-query results a serial run would."""
    from merizo_search_tpu.server import SearchService

    prefix, coords_list = service_db
    svc = SearchService(prefix, precision="fp32", max_batch=8,
                        batch_window_ms=50.0)
    bodies = [{"coords": c.tolist(), "k": 3, "skip_tmalign": True}
              for c in coords_list[:6]]
    serial = [svc.search(dict(b)) for b in bodies]
    base_batches = svc.n_batches

    results = [None] * len(bodies)
    def worker(i):
        results[i] = svc.search(dict(bodies[i]))
    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(bodies))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == serial
    # 6 concurrent requests with a 50ms window: strictly fewer batches
    # than requests proves coalescing happened
    assert svc.n_batches - base_batches < len(bodies)
    assert svc.n_requests == 2 * len(bodies)


def test_microbatcher_minority_key_not_starved_and_per_query_retry():
    """ADVICE r2: an options-mismatched request must seed the next batch
    (not requeue behind newer arrivals), and one failing query must not
    fail its co-batched travellers."""
    import time as _t

    from merizo_search_tpu.server import MicroBatcher

    calls = []

    def fn(key, items):
        calls.append((key, list(items)))
        if any(i == "bad" for i in items):
            if len(items) > 1:
                raise RuntimeError("batch poisoned")
            raise ValueError("bad item")
        return [f"{key}:{i}" for i in items]

    mb = MicroBatcher(fn, max_batch=8, linger_ms=30.0)
    # majority key A, one minority B in the middle: B must be served as the
    # immediate next batch seed
    futs = [mb.submit("A", 1), mb.submit("A", 2), mb.submit("B", 9),
            mb.submit("A", 3)]
    assert futs[2].result(timeout=5) == "B:9"
    assert [f.result(timeout=5) for f in (futs[0], futs[1], futs[3])] == [
        "A:1", "A:2", "A:3"]

    # poisoned batch: co-travellers succeed via per-query retry
    f_ok = mb.submit("C", "good")
    f_bad = mb.submit("C", "bad")
    _t.sleep(0.01)
    f_ok2 = mb.submit("C", "good2")
    assert f_ok.result(timeout=5) == "C:good"
    assert f_ok2.result(timeout=5) == "C:good2"
    try:
        f_bad.result(timeout=5)
        raise AssertionError("bad item must raise")
    except ValueError:
        pass


def test_strict_option_types(running_server):
    base, coords = running_server
    q = {"coords": coords[0].tolist(), "seq": "A" * len(coords[0])}
    for bad in ({"skip_tmalign": "false"}, {"mincos": [0.5]},
                {"mintm": "0.5"}, {"mincov": 2.0}):
        req = urllib.request.Request(
            base + "/search", data=json.dumps({**q, **bad}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req)
            assert False, f"expected HTTP 400 for {bad}"
        except urllib.error.HTTPError as e:
            assert e.code == 400, bad


def test_oversized_body_rejected_before_read(running_server):
    base, _ = running_server
    req = urllib.request.Request(
        base + "/search", data=b"{}",
        headers={"Content-Type": "application/json",
                 # lie about the length: must be rejected on the header,
                 # not buffered
                 "Content-Length": str(100 * 1024 * 1024)})
    try:
        urllib.request.urlopen(req)
        assert False, "expected HTTP 413"
    except urllib.error.HTTPError as e:
        assert e.code == 413
    except (ConnectionError, urllib.error.URLError):
        pass  # server may cut the connection after replying; both are fine
