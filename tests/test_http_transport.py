"""Integration-shape test for the ``http`` transport (VERDICT r5 "Next
round" #7): a real in-process HTTP server serves explorer-style JSON
pages over real sockets, and the full ``merl-paged`` read runs against
it — exercising request construction, the retry/backoff loop on a live
rate-limit envelope, per-page field drift, and short-page termination
end-to-end.  No external network: the server binds 127.0.0.1 and dies
with the test."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from merl_etl_spark.sources.datasource import register_sources

TOTAL_ROWS = 10
PAGE_SIZE = 4

# explorer variants rotate per page — the drift the tolerant extractor
# must absorb (merlin_etl.py:276-289)
DRIFT = (
    ("TokenHolderAddress", "TokenHolderQuantity"),
    ("holderAddress", "quantity"),
    ("address", "value"),
)


class _ExplorerHandler(BaseHTTPRequestHandler):
    server_version = "FixtureExplorer/1.0"

    def log_message(self, *args):  # keep pytest output clean
        pass

    def do_GET(self):  # noqa: N802 (http.server API name)
        q = parse_qs(urlparse(self.path).query)
        page = int(q["page"][0])
        offset = int(q["offset"][0])
        counts = self.server.request_counts  # type: ignore[attr-defined]
        with self.server.lock:  # type: ignore[attr-defined]
            counts[page] = counts.get(page, 0) + 1
            attempt = counts[page]
        # the endpoint's module/action/contract params must round-trip
        assert q["module"] == ["token"] and q["action"] == ["tokenholderlist"]
        if page == 2 and attempt == 1:
            # first hit on page 2: live rate-limit envelope → the reader
            # must back off and retry over the socket, not truncate
            body = {"status": "0", "message": "NOTOK",
                    "result": "Max rate limit reached"}
        else:
            lo = (page - 1) * offset
            rows = []
            addr_k, qty_k = DRIFT[(page - 1) % len(DRIFT)]
            for i in range(lo, min(lo + offset, TOTAL_ROWS)):
                rows.append({addr_k: f"0x{i:040x}", qty_k: str(1000 + i)})
            body = {"status": "1", "message": "OK", "result": rows}
        payload = json.dumps(body).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture()
def explorer_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ExplorerHandler)
    srv.request_counts = {}  # type: ignore[attr-defined]
    srv.lock = threading.Lock()  # type: ignore[attr-defined]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv
    finally:
        srv.shutdown()
        srv.server_close()


def test_merl_paged_http_end_to_end(spark, explorer_server):
    register_sources(spark)
    port = explorer_server.server_address[1]
    df = (
        spark.read.format("merl-paged")
        .option("transport", "http")
        .option("url", f"http://127.0.0.1:{port}/api")
        .option("contract", "0xfeed")
        .option("page_size", str(PAGE_SIZE))
        .option("max_pages", "10")
        .option("num_partitions", "1")
        .option("max_backoff_s", "0.05")
        .load()
    )
    rows = df.collect()
    # all TOTAL_ROWS arrive exactly once, across 3 pages (4+4+2, short stop)
    assert len(rows) == TOTAL_ROWS
    assert {r.page for r in rows} == {1, 2, 3}
    # drift absorbed: every page's variant lands in the normalized columns
    assert {r.holder_address for r in rows} == {f"0x{i:040x}" for i in range(TOTAL_ROWS)}
    assert {r.quantity_raw for r in rows} == {str(1000 + i) for i in range(TOTAL_ROWS)}
    counts = explorer_server.request_counts  # type: ignore[attr-defined]
    # page 2 was fetched twice (error envelope then retry); pages past the
    # short page were never requested
    assert counts[2] == 2
    assert counts[1] == 1 and counts[3] == 1
    assert 4 not in counts
