"""Serving daemon (serve.py / cerberusdet_tpu/serve): dynamic batching over
the one-program inference pipeline behind a stdlib HTTP front end."""

import json
import threading
import urllib.request

import cv2
import jax
import numpy as np
import pytest

from cerberusdet_tpu.infer import CerberusDetInference, CerberusPreprocessor
from cerberusdet_tpu.models.cerberus import CerberusModel
from cerberusdet_tpu.serve import BatchingEngine, make_server


@pytest.fixture(scope="module")
def engine():
    model = CerberusModel("configs/models/yolov8n_2task.yaml", ["t1", "t2"], [2, 3])
    params = model.init(jax.random.PRNGKey(0))
    inf = CerberusDetInference(
        model=model, params=params,
        names={"t1": ["a", "b"], "t2": ["x", "y", "z"]},
        conf_thres=0.01, img_size=64, half=False)
    eng = BatchingEngine(inf, CerberusPreprocessor(img_size=64),
                         max_batch=4, max_wait_ms=30.0)
    yield eng
    eng.stop()


@pytest.fixture(scope="module")
def server(engine):
    srv = make_server(engine, ["t1", "t2"], host="127.0.0.1", port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def _jpg(seed: int) -> bytes:
    img = np.random.default_rng(seed).integers(0, 255, (80, 120, 3), np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return buf.tobytes()


def _post(url: str, data: bytes):
    req = urllib.request.Request(url + "/predict", data=data, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_engine_batches_and_resolves(engine):
    futs = [engine.submit(
        np.random.default_rng(i).integers(0, 255, (60, 90, 3), np.uint8))
        for i in range(6)]
    outs = [f.result(timeout=120) for f in futs]
    assert len(outs) == 6
    for dets in outs:
        for d in dets:
            assert set(d) == {"box", "score", "label", "label_name", "task"}
    # 6 requests at max_batch=4 -> at least 2 device batches
    assert engine.stats["batches"] >= 2
    assert engine.stats["requests"] >= 6


def test_http_predict_and_health(server):
    status, body = _post(server, _jpg(0))
    assert status == 200
    assert "detections" in body
    for d in body["detections"]:
        assert set(d) == {"box", "score", "label", "label_name", "task"}
        assert d["task"] in ("t1", "t2")

    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health == {"status": "ok", "tasks": ["t1", "t2"]}

    with urllib.request.urlopen(server + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["requests"] >= 1


def test_http_concurrent_requests_batch(server):
    results = [None] * 5

    def post(i):
        results[i] = _post(server, _jpg(i + 1))

    threads = [threading.Thread(target=post, args=(i,)) for i in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=150)
    assert all(r is not None and r[0] == 200 for r in results)


def test_http_bad_body(server):
    req = urllib.request.Request(server + "/predict", data=b"not an image",
                                 method="POST")
    try:
        urllib.request.urlopen(req, timeout=30)
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        assert e.code == 400
    assert raised


@pytest.mark.slow
def test_engine_over_mesh_matches_single_device():
    """serve.py --mesh path: a BatchingEngine whose inference is sharded over
    the 8-device mesh resolves the same detections as the unmeshed engine
    (padded partial batches shard over the data axis)."""
    from cerberusdet_tpu.parallel.mesh import make_mesh

    model = CerberusModel("configs/models/yolov8n_2task.yaml", ["t1", "t2"], [2, 3])
    params = model.init(jax.random.PRNGKey(0))
    common = dict(model=model, params=params,
                  names={"t1": ["a", "b"], "t2": ["x", "y", "z"]},
                  conf_thres=0.01, img_size=64, half=False)
    pre = CerberusPreprocessor(img_size=64)
    single = BatchingEngine(CerberusDetInference(**common), pre,
                            max_batch=8, max_wait_ms=30.0)
    meshed = BatchingEngine(CerberusDetInference(**common, mesh=make_mesh()),
                            pre, max_batch=8, max_wait_ms=30.0)
    imgs = [np.random.default_rng(i).integers(0, 255, (60, 90, 3), np.uint8)
            for i in range(3)]
    try:
        a = [f.result(timeout=300) for f in [single.submit(im) for im in imgs]]
        b = [f.result(timeout=300) for f in [meshed.submit(im) for im in imgs]]
    finally:
        single.stop()
        meshed.stop()
    assert len(a) == len(b) == 3
    for da, db in zip(a, b):
        assert len(da) == len(db)
        for ra, rb in zip(da, db):
            assert ra["task"] == rb["task"] and ra["label"] == rb["label"]
            np.testing.assert_allclose(ra["score"], rb["score"], rtol=1e-6)
            np.testing.assert_allclose(ra["box"], rb["box"], rtol=1e-5,
                                       atol=1e-3)


def test_serve_cli_mesh_divisibility_guard():
    """--mesh with a max-batch that doesn't divide the device count exits
    with a clear error before any model is built."""
    import jax

    import serve

    n = jax.device_count()
    if n == 1:
        pytest.skip("every batch divides a 1-device mesh; guard can't fire")
    # derive a non-multiple from the live device count instead of hardcoding,
    # so the test holds under any XLA_FLAGS device configuration
    with pytest.raises(SystemExit, match="must divide"):
        serve.main(["--weights", "nonexistent.ckpt.npz", "--mesh",
                    "--max-batch", str(n + 1)])


def test_http_oversize_and_bad_content_length(server, monkeypatch):
    import http.client
    import urllib.parse

    import cerberusdet_tpu.serve.server as srv_mod

    host = urllib.parse.urlparse(server).netloc
    # oversize: a Content-Length above the cap is rejected with 413 before
    # the body is buffered
    monkeypatch.setattr(srv_mod, "MAX_BODY_BYTES", 16)
    conn = http.client.HTTPConnection(host, timeout=30)
    conn.request("POST", "/predict", body=b"x" * 64)
    resp = conn.getresponse()
    assert resp.status == 413
    assert "error" in json.loads(resp.read())
    conn.close()

    # non-numeric Content-Length: 400, not a dropped connection
    conn = http.client.HTTPConnection(host, timeout=30)
    conn.putrequest("POST", "/predict")
    conn.putheader("Content-Length", "abc")
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 400
    conn.close()
