"""Push-ingestion API — the reference's Flask gateway (S7–S10,
`/root/reference/src/main.py`) restated on the standard library.

Endpoints (same surface, same filename contract):

- ``POST /ingest/csv``  — parse each uploaded CSV into records, echo as
  JSON (`src/main.py:12-31`).
- ``POST /ingest/blob`` — accept a JSON array of blobs, echo count
  (`src/main.py:34-45`).
- ``POST /ingest``      — store conforming ``polluant-{code}_{date}.csv``
  files into the landing zone and trigger the regular pipeline
  (`src/main.py:48-57`).
- ``POST /ingest/fast`` — same, but trigger the fast variant
  (`src/main.py:96-104`). Here both run the same Spark job — Spark IS the
  fast variant (the reference's thread pools and NumPy kernels are
  Tungsten/AQE built-ins, SURVEY.md §2.10) — so the flag only tags the
  trigger.

The reference posts to Airflow's REST API to start a DAG (S10,
`src/main.py:59-94`); here the trigger is a callable (e.g.
``pipeline.gold.run_pipeline``) invoked on a worker thread, which is what
an Airflow ``PythonOperator``/``SparkSubmitOperator`` would call. Uploads
use ``multipart/form-data`` exactly like the Flask original.

This is control-plane code: one driver-side process, no data-plane work —
every byte lands in the landing zone and is processed by Spark, so API
throughput only bounds file arrival, not query speed.
"""

from __future__ import annotations

import io
import json
import re
import threading
from collections.abc import Callable
from email.parser import BytesParser
from email.policy import HTTP
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

_FILENAME_RE = re.compile(r"^polluant-([^_/]+)_([0-9-]+)\.csv$")


def parse_multipart(body: bytes, content_type: str) -> list[tuple[str, bytes]]:
    """(filename, payload) pairs from a multipart/form-data body."""
    head = f"Content-Type: {content_type}\r\n\r\n".encode()
    msg = BytesParser(policy=HTTP).parsebytes(head + body)
    out = []
    for part in msg.iter_parts():
        name = part.get_filename()
        if name:
            out.append((name, part.get_payload(decode=True)))
    return out


def parse_csv_records(payload: bytes, sep: str = ";") -> list[dict[str, str]]:
    """CSV bytes -> list of {header: value} records (S7's echo semantics)."""
    import csv

    text = payload.decode("utf-8-sig")
    reader = csv.reader(io.StringIO(text), delimiter=sep)
    rows = list(reader)
    if not rows:
        return []
    header = rows[0]
    return [dict(zip(header, r)) for r in rows[1:] if any(c.strip() for c in r)]


class IngestHandler(BaseHTTPRequestHandler):
    landing_dir: Path
    trigger: Callable[[str], None] | None = None
    # Reject oversized bodies BEFORE reading them: a single huge POST must
    # not exhaust driver memory (mitigated otherwise only by the 127.0.0.1
    # bind). 100 MB covers the reference's largest monthly CSV ~50x over.
    max_body_bytes: int = 100 * 1024 * 1024

    def log_message(self, *a):  # quiet test output
        pass

    def _reply(self, code: int, obj) -> None:
        data = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _body_length(self) -> int | None:
        """Declared body size, or None (413 already sent) if over the cap."""
        length = int(self.headers.get("Content-Length", 0))
        if length > self.max_body_bytes:
            self._reply(
                413,
                {"error": f"body exceeds {self.max_body_bytes} bytes"},
            )
            return None
        return length

    def _files(self) -> list[tuple[str, bytes]] | None:
        length = self._body_length()
        if length is None:
            return None
        body = self.rfile.read(length)
        return parse_multipart(body, self.headers.get("Content-Type", ""))

    def do_POST(self) -> None:  # noqa: N802 - http.server contract
        try:
            if self.path == "/ingest/csv":
                files = self._files()
                if files is None:
                    return
                records = {
                    name: parse_csv_records(payload)
                    for name, payload in files
                    if name.endswith(".csv")
                }
                self._reply(200, {"parsed": {k: len(v) for k, v in records.items()}})
            elif self.path == "/ingest/blob":
                length = self._body_length()
                if length is None:
                    return
                blobs = json.loads(self.rfile.read(length) or b"[]")
                if not isinstance(blobs, list):
                    self._reply(400, {"error": "expected a JSON array"})
                    return
                self._reply(200, {"accepted": len(blobs)})
            elif self.path in ("/ingest", "/ingest/fast"):
                files = self._files()
                if files is None:
                    return
                stored, skipped = [], []
                for name, payload in files:
                    if _FILENAME_RE.match(name):
                        (self.landing_dir / name).write_bytes(payload)
                        stored.append(name)
                    else:
                        skipped.append(name)  # P8 filename-format filter
                if stored and self.trigger is not None:
                    variant = "fast" if self.path.endswith("fast") else "regular"
                    threading.Thread(
                        target=self.trigger, args=(variant,), daemon=True
                    ).start()
                self._reply(200, {"stored": stored, "skipped": skipped})
            else:
                self._reply(404, {"error": "unknown endpoint"})
        except Exception as exc:  # pragma: no cover - defensive
            self._reply(500, {"error": str(exc)})


def serve(
    landing_dir: str,
    trigger: Callable[[str], None] | None = None,
    port: int = 0,
) -> ThreadingHTTPServer:
    """Start the ingest API on ``port`` (0 = ephemeral); returns the server
    (``server.server_address[1]`` is the bound port; ``shutdown()`` stops)."""
    Path(landing_dir).mkdir(parents=True, exist_ok=True)
    handler = type(
        "BoundIngestHandler",
        (IngestHandler,),
        {"landing_dir": Path(landing_dir), "trigger": trigger},
    )
    server = ThreadingHTTPServer(("127.0.0.1", port), handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
