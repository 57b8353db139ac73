"""webcv2: remote cv2.imshow/waitKey replacement over HTTP.

Counterpart of the reference's `concern/webcv2` (flask+gevent-websocket
server, manager.py:30-57) used for in-model visual debugging. This build
uses only the stdlib (http.server in a daemon thread): images queued via
imshow() are served as an auto-refreshing HTML gallery at
http://<host>:<port>/.
"""

from __future__ import annotations

import http.server
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

_images: Dict[str, bytes] = {}
_lock = threading.Lock()
_server: Optional[threading.Thread] = None
_port = 8888

_PAGE = b"""<html><head><meta http-equiv="refresh" content="2">
<style>body{background:#222;color:#eee;font-family:monospace}
img{max-width:45%%;margin:4px;border:1px solid #555}</style></head>
<body><h3>webcv2</h3>%s</body></html>"""


class _Handler(http.server.BaseHTTPRequestHandler):
    def log_message(self, *args):  # silent
        pass

    def do_GET(self):
        with _lock:
            if self.path == "/":
                tags = "".join(
                    f'<div>{name}<br><img src="/img/{name}"></div>'
                    for name in sorted(_images)
                ).encode()
                body = _PAGE % tags
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(body)
                return
            if self.path.startswith("/img/"):
                name = self.path[len("/img/"):]
                data = _images.get(name)
                if data is not None:
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                    self.end_headers()
                    self.wfile.write(data)
                    return
        self.send_response(404)
        self.end_headers()


def _ensure_server(port: int = 8888):
    global _server, _port
    if _server is not None:
        return
    _port = port
    httpd = http.server.ThreadingHTTPServer(("0.0.0.0", port), _Handler)
    _server = threading.Thread(target=httpd.serve_forever, daemon=True)
    _server.start()


def imshow(name: str, image: np.ndarray, port: int = 8888):
    """Queue an image (BGR uint8) for display at http://host:port/."""
    _ensure_server(port)
    ok, buf = cv2.imencode(".jpg", image)
    if ok:
        with _lock:
            _images[str(name)] = buf.tobytes()


def waitKey(delay: int = 0) -> int:
    """No-op for API compatibility (images are already being served)."""
    return -1
