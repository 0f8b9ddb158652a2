"""Minimal production render server over an exported ``.rmx`` artifact.

Stdlib-only (http.server) HTTP frontend for artifacts built by
:func:`ray_marching_tpu.io.export.export_render` — the deploy-side half of
the compile-once serving story. The server process needs no scene graph
and never traces Python: it deserializes StableHLO, warms it up once, and
answers pose queries with PNG frames.

    GET /meta                                  -> artifact metadata (JSON)
    GET /render?pose=qw,qx,qy,qz/x,y,z         -> image/png
    GET /healthz                               -> 200 once warmed up

The reference has no serving story (an interactive ``main.py`` only,
reference main.py:19-88); this is a TPU-framework capability extension.
"""

from __future__ import annotations

import json
import logging
import threading
from http.server import ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

log = logging.getLogger("ray_marching_tpu.serve")


def _parse_pose(spec: str, dtype):
    import jax.numpy as jnp

    q_str, t_str = spec.split("/")
    q = np.asarray([float(v) for v in q_str.split(",")], np.float64)
    t = [float(v) for v in t_str.split(",")]
    if q.shape != (4,) or len(t) != 3:
        # Wrong arity is the caller's fault (HTTP 400), not a device error.
        raise ValueError(
            f"pose must be 'qw,qx,qy,qz/x,y,z' (got {q.shape[0]} quaternion "
            f"and {len(t)} translation components)"
        )
    q = q / np.linalg.norm(q)
    return jnp.asarray([q], dtype), jnp.asarray([t], dtype)


class RenderServer:
    """Load an artifact, warm it up, and serve frames.

    ``handle_request()`` (one request) and ``serve_forever()`` mirror the
    underlying http.server; ``start()`` runs the loop on a daemon thread
    and returns, for embedding in tests or larger processes.
    """

    def __init__(self, artifact, host: str = "127.0.0.1", port: int = 8371,
                 params_npz=None):
        import jax.numpy as jnp

        from ray_marching_tpu.io.export import load_render
        from ray_marching_tpu.io.image import encode_png

        self.render_fn, self.params, self.meta = load_render(artifact)
        if params_npz is not None:  # hot-swap optimized parameters
            import jax

            from ray_marching_tpu.io.checkpoint import load_pytree

            self.params = load_pytree(params_npz, self.params)
        self.dtype = jnp.dtype(self.meta["dtype"])
        self._encode = encode_png
        self._lock = threading.Lock()  # serialize device work per process
        n = self.meta["num_cameras"]
        # Warm-up: compile the StableHLO now so the first query is fast.
        q, t = _parse_pose("1,0,0,0/0,0,0", self.dtype)
        if n > 1:
            q = jnp.concatenate([q] * n, axis=0)
            t = jnp.concatenate([t] * n, axis=0)
        np.asarray(self.render_fn(self.params, q, t))
        self._warm = True
        from ray_marching_tpu.io.httpserver import CountingHandler, new_stats

        #: request/error counters (monotonic; read for observability —
        #: tests assert on them, ops can scrape them via /stats).
        self.stats = new_stats()

        server = self

        class Handler(CountingHandler):
            stats = server.stats
            log = globals()["log"]

            def handle_route(self, method):
                url = urlparse(self.path)
                if method != "GET":
                    self._send(404, b"not found", "text/plain")
                elif url.path == "/healthz":
                    self._send(200, b"ok", "text/plain")
                elif url.path == "/meta":
                    self._send(
                        200, json.dumps(server.meta).encode(),
                        "application/json",
                    )
                elif url.path == "/stats":
                    self._send(
                        200, json.dumps(server.stats).encode(),
                        "application/json",
                    )
                elif url.path == "/render":
                    qs = parse_qs(url.query)
                    pose = qs.get("pose", ["1,0,0,0/0,0,0"])[0]
                    try:  # malformed pose strings are the caller's fault
                        q, t = _parse_pose(pose, server.dtype)
                    except (ValueError, IndexError) as exc:
                        self.bump("errors_400")
                        self.log.warning("400 %s: %s", self.path, exc)
                        self._send(400, str(exc).encode(), "text/plain")
                        return
                    png = server.render_png_arrays(q, t)
                    self._send(200, png, "image/png")
                else:
                    self._send(404, b"not found", "text/plain")

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]

    def render_png(self, pose: str) -> bytes:
        q, t = _parse_pose(pose, self.dtype)
        return self.render_png_arrays(q, t)

    def render_png_arrays(self, q, t) -> bytes:
        import jax.numpy as jnp

        n = self.meta["num_cameras"]
        if n > 1:
            q = jnp.concatenate([q] * n, axis=0)
            t = jnp.concatenate([t] * n, axis=0)
        with self._lock:
            img = np.asarray(self.render_fn(self.params, q, t))
        return self._encode(np.nan_to_num(img.mean(axis=0), nan=0.0))

    def handle_request(self):
        self.httpd.handle_request()

    def serve_forever(self):
        self.httpd.serve_forever()

    def start(self):
        thread = threading.Thread(target=self.serve_forever, daemon=True)
        thread.start()
        return thread

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()
