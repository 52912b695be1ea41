"""Thin HTTP serving wrapper around the in-process sharded index.

Parity with the reference's standalone FastAPI index server
(build_server/server_start.py:181-201: POST /retrieve with flattened query
embeddings -> [docs, scores]; POST /rebuild reloading from a checkpoint dir)
— but as an *optional* veneer: in this framework training never needs the
server (the index lives in the same program; SURVEY.md §5.8), so this exists
for external consumers / serving deployments only. stdlib http.server
(fastapi is not in this image), threaded.
"""

from __future__ import annotations

import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class IndexServer:
    """Serve an index + passage store over HTTP.

    endpoints:
      POST /retrieve {"query_embs": [flat f32], "bsz": B, "topk": K}
            -> [[passages per query], [scores per query]]
      POST /rebuild  {"load_dir": optional} -> {"status": "ok"}
            (invokes the registered rebuild callback — the in-process
             re-embed, replacing the reference's checkpoint reload)
      GET  /health   -> {"status": "ok", "n_passages": N}
    """

    def __init__(self, index, store, dim: int, rebuild_fn=None,
                 host: str = "127.0.0.1", port: int = 29501):
        self.index = index
        self.store = store
        self.dim = dim
        self.rebuild_fn = rebuild_fn
        self.host, self.port = host, port
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------------ http
    def _handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet
                logger.debug(fmt, *args)

            def _send(self, code: int, payload):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/health":
                    self._send(200, {"status": "ok",
                                     "n_passages": len(server.store)})
                else:
                    self._send(404, {"error": "unknown endpoint"})

            def do_POST(self):
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    data = json.loads(self.rfile.read(length) or b"{}")
                except Exception as e:
                    self._send(400, {"error": f"bad json: {e}"})
                    return
                if self.path == "/retrieve":
                    self._retrieve(data)
                elif self.path == "/rebuild":
                    self._rebuild(data)
                else:
                    self._send(404, {"error": "unknown endpoint"})

            def _retrieve(self, data):
                try:
                    bsz = int(data["bsz"])
                    topk = int(data.get("topk", 10))
                    q = np.asarray(data["query_embs"], np.float32)
                    q = q.reshape(bsz, server.dim)
                except Exception as e:
                    self._send(400, {"error": f"bad request: {e}"})
                    return
                try:
                    scores, ids = server.index.search(jnp.asarray(q), topk)
                    ids = np.asarray(ids)
                    # -1 marks unfilled slots (IVF with n_probe too small
                    # for topk); a raw store[int(i)] would wrap to the LAST
                    # passage via python negative indexing
                    docs = [[({} if i < 0 else
                              dict(server.store[int(i)]))
                             for i in row] for row in ids]
                    self._send(200, [docs, np.asarray(scores).tolist()])
                except Exception as e:  # search/store failure -> JSON 500
                    self._send(500, {"error": str(e)})

            def _rebuild(self, data):
                if server.rebuild_fn is None:
                    self._send(400, {"error": "no rebuild callback"})
                    return
                try:
                    server.rebuild_fn(data.get("load_dir"))
                except Exception as e:
                    self._send(500, {"error": str(e)})
                    return
                self._send(200, {"status": "ok"})

        return Handler

    # --------------------------------------------------------------- control
    def start(self) -> int:
        self._httpd = ThreadingHTTPServer((self.host, self.port),
                                          self._handler())
        self.port = self._httpd.server_port
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        logger.info("index server on %s:%d", self.host, self.port)
        return self.port

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd = None
