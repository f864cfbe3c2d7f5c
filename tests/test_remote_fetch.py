"""Tests for the REST ingestion client (S1/S2/F7) against a local stub API."""

from __future__ import annotations

import datetime as dt
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from datalakes_and_data_integration_spark.sources.remote_fetch import (
    RateLimitedError,
    download_file,
    fetch_window_to_landing,
    last_n_days,
    request_file_generation,
)


class StubAPI(BaseHTTPRequestHandler):
    """Exports become ready on the 3rd download poll; id '429' rate-limits."""

    polls: dict[str, int] = {}

    def log_message(self, *a):
        pass

    def _send(self, code: int, body: bytes = b""):
        self.send_response(code)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        url = urlparse(self.path)
        q = parse_qs(url.query)
        if url.path == "/export":
            date, code = q["date"][0], q["polluant"][0]
            if code == "999":
                self._send(400)
                return
            self._send(200, json.dumps({"id": f"{code}:{date}"}).encode())
        elif url.path == "/download":
            fid = q["id"][0]
            if fid == "429":
                self._send(429)
                return
            n = self.polls.get(fid, 0) + 1
            self.polls[fid] = n
            if n < 3:
                self._send(412)  # not ready yet
            else:
                self._send(200, f"data-for-{fid}".encode())
        else:
            self._send(404)


@pytest.fixture()
def api():
    StubAPI.polls = {}
    server = ThreadingHTTPServer(("127.0.0.1", 0), StubAPI)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_last_n_days():
    days = last_n_days(3, today=dt.date(2025, 3, 9))
    assert days == ["2025-03-09", "2025-03-08", "2025-03-07"]


def test_request_and_polling_download(api):
    fid = request_file_generation(api, None, "2025-03-07", "01")
    assert fid == "01:2025-03-07"
    assert request_file_generation(api, None, "2025-03-07", "999") is None
    payload = download_file(
        api, None, fid, initial_delay=0, wait_between_attempts=0
    )
    assert payload == b"data-for-01:2025-03-07"
    assert StubAPI.polls[fid] == 3  # two 412s then ready


def test_download_gives_up_after_max_attempts(api):
    assert (
        download_file(
            api, None, "slow", initial_delay=0, max_attempts=2,
            wait_between_attempts=0,
        )
        is None
    )


def test_rate_limit_raises(api):
    with pytest.raises(RateLimitedError):
        download_file(api, None, "429", initial_delay=0)


def test_fetch_window_layout(api, tmp_path):
    stored = fetch_window_to_landing(
        api, None, str(tmp_path), ["01", "999"], n_days=2,
        initial_delay=0, wait_between_attempts=0,
    )
    assert len(stored) == 2  # code 999 refused at export time
    for name in stored:
        assert name.startswith("polluant-01_") and name.endswith(".csv")
        assert (tmp_path / name).exists()
