"""Connectivity-diagnostic HTTP echo stub.

Equivalent of the reference's standalone httpserver.py (SURVEY.md §2.14):
an HTTP server that echoes the request line and headers back, used to
verify that a mobile client can reach the serving host at all before
debugging the detection protocol. Not wired into the main path.

Usage: python -m fastdet_tpu.cli.httpserver [-s port]
"""

from __future__ import annotations

import getopt
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer


class EchoHandler(BaseHTTPRequestHandler):
    def do_GET(self):
        body = [f"{self.requestline}\n"]
        for k, v in self.headers.items():
            body.append(f"{k}: {v}\n")
        data = "".join(body).encode("utf-8")
        self.send_response(200)
        self.send_header("Content-Type", "text/plain; charset=utf-8")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    do_POST = do_GET


def main(argv):
    port = 8080
    try:
        (opts, _args) = getopt.getopt(argv[1:], "s:")
    except getopt.GetoptError:
        print(f"usage: {argv[0]} [-s port]")
        return 100
    for (k, v) in opts:
        if k == "-s":
            port = int(v)
    server = HTTPServer(("", port), EchoHandler)
    print(f"echo server listening on :{port}")
    server.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
