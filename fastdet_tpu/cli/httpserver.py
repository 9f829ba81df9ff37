"""Connectivity-diagnostic HTTP stub.

Equivalent of the reference's standalone httpserver.py (SURVEY.md §2.14,
reference server/httpserver.py): an HTTP server used to verify that a
mobile client can reach the serving host at all before debugging the
detection protocol. Behavior matches the reference: ``GET /`` echoes
``repr((requestline, headers))``, any other path is 404, ``HEAD``
returns 200; flags are ``[-d] [-s port]`` with default port 10000 and
the same logging format. Not wired into the main path.

Usage: python -m fastdet_tpu.cli.httpserver [-d] [-s port]
"""

from __future__ import annotations

import getopt
import logging
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer


class DiagHandler(BaseHTTPRequestHandler):
    def __init__(self, *args, **kwargs):
        self.logger = logging.getLogger()
        super().__init__(*args, **kwargs)

    def do_HEAD(self):
        self.send_response(200)

    def do_GET(self):
        self.logger.info(f"{self.command}: path={self.path}")
        if self.path != "/":
            self.send_response(404)
            self.send_header("Content-Type", "text/plain")
            self.end_headers()
            self.wfile.write(b"not found")
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/plain")
        self.end_headers()
        data = (self.requestline, dict(self.headers))
        self.wfile.write(repr(data).encode("utf-8"))


def main(argv):
    def usage():
        print(f"usage: {argv[0]} [-d] [-s port]")
        return 100

    try:
        (opts, _args) = getopt.getopt(argv[1:], "ds:")
    except getopt.GetoptError:
        return usage()
    level = logging.INFO
    port = 10000
    for (k, v) in opts:
        if k == "-d":
            level = logging.DEBUG
        elif k == "-s":
            port = int(v)
    logging.basicConfig(format="%(asctime)s %(levelname)s %(message)s",
                        level=level)
    logging.info(f"listening: port={port}...")
    with HTTPServer(("", port), DiagHandler) as httpd:
        httpd.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
