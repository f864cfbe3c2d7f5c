"""Driver-side REST ingestion: export-request + polling download with
retry/backoff (reference S1/S2, `/root/reference/src/unpacked_to_raw.py:
32-87`), and the last-N-days fetch window (F7, `:24-29`).

Ingestion from a rate-limited external API is control-plane work that
belongs on the driver (or an external scheduler), not in Spark executors:
one request per (date, pollutant) with a 15/hour budget is the opposite of
a data-parallel problem. The fetched bytes land in the landing zone, where
the Spark pipeline takes over.

Semantics mirrored from the reference:
- export request returns a file id (or None on non-200) — `:32-47`;
- download polls ``download?id=`` after an initial delay, retries on HTTP
  412 (file not ready) up to ``max_attempts`` with a fixed wait — `:50-87`
  (412 at `:72-76`);
- HTTP 429 (rate limit) raises instead of retrying — `:77-78`;
- fetch window = the last N days as YYYY-MM-DD strings — `:24-29`.

Implemented on ``urllib`` (stdlib) so the container needs no extra
packages.
"""

from __future__ import annotations

import datetime as dt
import json
import time
import urllib.error
import urllib.parse
import urllib.request


class RateLimitedError(RuntimeError):
    """HTTP 429 from the upstream API (15 requests/hour budget)."""


def last_n_days(n: int, today: dt.date | None = None) -> list[str]:
    """The last ``n`` days, newest first, as YYYY-MM-DD (F7)."""
    today = today or dt.date.today()
    return [(today - dt.timedelta(days=i)).isoformat() for i in range(n)]


def _get(url: str, api_key: str | None, timeout: float) -> tuple[int, bytes]:
    req = urllib.request.Request(url)
    if api_key:
        req.add_header("apikey", api_key)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as err:
        return err.code, err.read()


def request_file_generation(
    base_url: str,
    api_key: str | None,
    date: str,
    pollutant_code: str,
    timeout: float = 30.0,
) -> str | None:
    """Ask the API to generate an export for (date, pollutant); returns the
    file id, or None when the request is refused (S1)."""
    qs = urllib.parse.urlencode({"date": date, "polluant": pollutant_code})
    status, body = _get(f"{base_url}/export?{qs}", api_key, timeout)
    if status == 429:
        raise RateLimitedError("export request rate-limited (HTTP 429)")
    if status != 200:
        return None
    try:
        return json.loads(body).get("id")
    except (ValueError, AttributeError):
        return body.decode().strip() or None


def download_file(
    base_url: str,
    api_key: str | None,
    file_id: str,
    initial_delay: float = 2.0,
    max_attempts: int = 5,
    wait_between_attempts: float = 2.0,
    timeout: float = 30.0,
) -> bytes | None:
    """Poll ``download?id=`` until the export is ready (S2).

    HTTP 412 = not ready yet -> wait and retry, up to ``max_attempts``.
    HTTP 429 -> RateLimitedError (no retry; the budget is gone).
    Any other non-200 -> None.
    """
    time.sleep(initial_delay)
    qs = urllib.parse.urlencode({"id": file_id})
    url = f"{base_url}/download?{qs}"
    for attempt in range(max_attempts):
        status, body = _get(url, api_key, timeout)
        if status == 200:
            return body
        if status == 429:
            raise RateLimitedError("download rate-limited (HTTP 429)")
        if status != 412:
            return None
        if attempt < max_attempts - 1:
            time.sleep(wait_between_attempts)
    return None


def fetch_window_to_landing(
    base_url: str,
    api_key: str | None,
    landing_dir: str,
    pollutant_codes: list[str],
    n_days: int = 3,
    **download_kwargs,
) -> list[str]:
    """Fetch the last ``n_days`` for every pollutant into the landing zone
    with the reference's key layout ``polluant-{code}_{date}.csv``
    (unpacked_to_raw.py:122-124). Returns the stored filenames.

    Re-fetching an overlapping window daily is the reference's late-data
    strategy (SURVEY.md §2.8); downstream dedup + keyed upsert make it
    idempotent.
    """
    from pathlib import Path

    out = []
    landing = Path(landing_dir)
    landing.mkdir(parents=True, exist_ok=True)
    for date in last_n_days(n_days):
        for code in pollutant_codes:
            file_id = request_file_generation(base_url, api_key, date, code)
            if not file_id:
                continue
            payload = download_file(base_url, api_key, file_id, **download_kwargs)
            if payload is None:
                continue
            name = f"polluant-{code}_{date}.csv"
            (landing / name).write_bytes(payload)
            out.append(name)
    return out
