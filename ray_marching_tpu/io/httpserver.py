"""Shared scaffolding for the repo's stdlib HTTP servers.

Both the artifact server (serve.py) and the browser live viewer (web.py)
need the same plumbing: quiet request logging, a Content-Length-correct
``_send``, monotonic request/error counters safe under
ThreadingHTTPServer's per-request threads, and the
OSError-vs-server-error split on every route (a client that vanished
mid-response is not a 500). This base holds exactly that; subclasses
implement ``handle_route(method)``.
"""

from __future__ import annotations

import logging
import threading
from http.server import BaseHTTPRequestHandler


def new_stats() -> dict:
    """Fresh counter dict (monotonic; scrape via the server's /stats or
    /state endpoint)."""
    return {"requests": 0, "errors_400": 0, "errors_500": 0,
            "client_drops": 0}


class CountingHandler(BaseHTTPRequestHandler):
    """Route-dispatching handler with locked counters and error split.

    Subclasses (usually closures over a server object) must set class
    attributes ``stats`` (a new_stats() dict), ``log`` (a logger), and
    implement :meth:`handle_route`; they use :meth:`bump` for 400-class
    counts of their own.
    """

    stats: dict = None  # set by subclass
    log = logging.getLogger("ray_marching_tpu.http")
    _stats_lock = threading.Lock()  # class-wide: counters are tiny

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def bump(self, key: str) -> None:
        # += on a dict entry is a non-atomic read-modify-write; handler
        # threads race without this lock and drop counts.
        with self._stats_lock:
            self.stats[key] += 1

    def _send(self, code, body: bytes, ctype: str, seq=None):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Cache-Control", "no-store")
        if seq is not None:
            self.send_header("X-Seq", str(seq))
        self.end_headers()
        self.wfile.write(body)

    def handle_route(self, method: str) -> None:
        raise NotImplementedError

    def _dispatch(self, method: str) -> None:
        self.bump("requests")
        try:
            self.handle_route(method)
        except OSError as exc:
            # Socket already broken (client gone mid-response) — nothing
            # sensible left to write; count + log it.
            self.bump("client_drops")
            self.log.info("client dropped %s: %s", self.path, exc)
        except Exception as exc:  # device/handler failure: ours
            self.bump("errors_500")
            self.log.exception("500 %s", self.path)
            try:
                self._send(500, str(exc).encode(), "text/plain")
            except OSError:
                self.bump("client_drops")

    def do_GET(self):
        self._dispatch("GET")

    def do_POST(self):
        self._dispatch("POST")
