"""Production serving daemon: dynamic request batching over the one-program
inference pipeline (`CerberusDetInference`), stdlib-HTTP front end.

The reference ships only an offline CLI (cerberusdet/detect.py) and a
library API (cerberusdet_inference.py); a deployment story for the "serving"
half of its mission is left to the user. This module closes that gap the
TPU way:

  * ONE compiled program shape. Requests are drained into batches of at
    most `max_batch`; partial batches are padded to `max_batch` (static
    shapes — XLA compiles exactly one serving program, no recompiles under
    bursty load). Padding rows are sliced off before responses.
  * The batcher thread owns the device: requests enqueue from any number of
    HTTP worker threads, results travel back through per-request futures.
  * Throughput under load comes from batching (the ~101 ms/batch32 int8
    serving program — tools/bench_serving — amortizes to ~3.1 ms/img); the
    `max_wait_ms` knob trades tail latency for batch fill.

Serving endpoints (JSON; see serve.py for the CLI):
  POST /predict    image bytes (jpg/png/bmp) -> {"detections": [...]} using
                   the reference detection-dict contract (box, score,
                   label, label_name, task).
  GET  /healthz    {"status": "ok", "tasks": [...]}
  GET  /stats      request counts + latency/batch-fill EWMAs.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List

import numpy as np

# request-body ceiling: generously above any real camera frame (a 100MP jpg
# is ~30 MB) while bounding per-connection RAM under hostile Content-Length
MAX_BODY_BYTES = 64 * 1024 * 1024


class BatchingEngine:
    """Dynamic batcher: submit() images from any thread, a single runner
    thread drains the queue into fixed-size device batches."""

    def __init__(self, inference, preprocessor, max_batch: int = 8,
                 max_wait_ms: float = 5.0):
        self.inference = inference
        self.pre = preprocessor
        self.max_batch = int(max_batch)
        self.max_wait = max_wait_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self.stats = {"requests": 0, "batches": 0, "errors": 0,
                      "latency_ms": 0.0, "batch_fill": 0.0}
        self._runner = threading.Thread(target=self._run, daemon=True)
        self._runner.start()

    def submit(self, img_bgr: np.ndarray) -> Future:
        """img_bgr: HWC uint8 (cv2 layout). Returns a Future resolving to
        the per-image detections list."""
        fut: Future = Future()
        self._q.put((img_bgr, fut, time.perf_counter()))
        return fut

    def stop(self):
        self._stop.set()
        self._q.put(None)
        self._runner.join(timeout=5)

    # ------------------------------------------------------------- runner
    def _drain(self):
        """Collect up to max_batch requests; after the first arrives, wait
        at most max_wait for the batch to fill."""
        items = []
        first = self._q.get()
        if first is None:
            return items
        items.append(first)
        deadline = time.perf_counter() + self.max_wait
        while len(items) < self.max_batch:
            timeout = deadline - time.perf_counter()
            if timeout <= 0:
                break
            try:
                nxt = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is None:
                break
            items.append(nxt)
        return items

    def _run(self):
        while not self._stop.is_set():
            items = self._drain()
            if not items:
                continue
            try:
                imgs = [it[0] for it in items]
                batch, shapes = self.pre.preprocess(imgs)
                batch = np.asarray(batch)
                n = len(imgs)
                if n < self.max_batch:
                    # pad to the ONE compiled batch shape; padded rows are
                    # computed (their NMS output exists) and discarded
                    pad = np.zeros((self.max_batch - n,) + batch.shape[1:],
                                   batch.dtype)
                    batch = np.concatenate([batch, pad], 0)
                    shapes = list(shapes) + [shapes[-1]] * (self.max_batch - n)
                out = self.inference.predict(batch, original_shape=shapes)
                now = time.perf_counter()
                for (_, fut, t0), dets in zip(items, out[:n]):
                    fut.set_result(dets)
                    lat = (now - t0) * 1000.0
                    s = self.stats
                    s["latency_ms"] = 0.9 * s["latency_ms"] + 0.1 * lat
                s = self.stats
                s["requests"] += n
                s["batches"] += 1
                s["batch_fill"] = 0.9 * s["batch_fill"] + 0.1 * (n / self.max_batch)
            except Exception as e:  # surface the failure to every waiter
                self.stats["errors"] += len(items)
                for _, fut, _ in items:
                    if not fut.done():
                        fut.set_exception(e)


def _to_jsonable(dets: List[dict]) -> List[dict]:
    out = []
    for d in dets:
        out.append({
            "box": [float(v) for v in d["box"]],
            "score": float(d["score"]),
            "label": int(d["label"]),
            "label_name": str(d["label_name"]),
            "task": str(d["task"]),
        })
    return out


def make_server(engine: BatchingEngine, tasks: List[str], host: str = "0.0.0.0",
                port: int = 8000, timeout_s: float = 60.0) -> ThreadingHTTPServer:
    """Build (not start) the threaded HTTP server wired to `engine`."""
    import cv2

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet access log
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/healthz"):
                self._json(200, {"status": "ok", "tasks": tasks})
            elif self.path.startswith("/stats"):
                self._json(200, engine.stats)
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if not self.path.startswith("/predict"):
                self._json(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                self._json(400, {"error": "bad Content-Length"})
                return
            if length <= 0:
                self._json(400, {"error": "empty body"})
                return
            if length > MAX_BODY_BYTES:
                self._json(413, {"error": f"body too large "
                                          f"(max {MAX_BODY_BYTES} bytes)"})
                return
            data = self.rfile.read(length)
            img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
            if img is None:
                self._json(400, {"error": "could not decode image"})
                return
            try:
                dets = engine.submit(img).result(timeout=timeout_s)
            except Exception as e:
                self._json(500, {"error": str(e)})
                return
            self._json(200, {"detections": _to_jsonable(dets)})

    return ThreadingHTTPServer((host, port), Handler)
