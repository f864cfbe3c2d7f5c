"""Custom Python DataSource (Spark 4 API) for the CSV landing zone.

The reference ingests landing files imperatively — list keys by pollutant
prefix, UTF-8(-BOM) decode, ``csv.reader(delimiter=';')``, skip header,
parse the filename for pollutant/date
(`/root/reference/src/preprocess_to_staging.py:113-130`,
`unpacked_to_raw.py:122-124,213-228`). ``sources/csv_landing.py`` restates
that with the built-in CSV reader; THIS module restates it as a
first-class Spark source via the Python DataSource API
(``pyspark.sql.datasource``), which is the right tool when a landing
format is NOT one of Spark's built-ins (proprietary dumps, API exports):

- ``landing_csv`` (batch): one InputPartition per conforming file, so
  reads parallelize across the cluster exactly like the built-in reader;
  the ``pollutant`` option prunes at the SOURCE (the S11 prefix-scan
  semantics — non-matching files are never opened, never even listed into
  partitions);
- ``landing_csv_stream`` (incremental): a SimpleDataSourceStreamReader
  whose offset is the content-addressed set of processed file names —
  new landing files (including late arrivals that sort before processed
  names, as the reference's re-fetch-3-days produces) are picked up
  exactly once per micro-batch, replay between committed offsets is
  deterministic and independent of the live listing, and a restarted
  checkpoint resumes where it left off.

Parity with the built-in path is pinned by tests/test_python_datasource.py
(same rows as ``read_landing_csv`` on the same landing dir). Note:
PythonMicroBatchStream does not support Trigger.AvailableNow — Spark
falls back to one catch-up micro-batch per start, which is exactly the
scheduled-ingest cadence here; the offset contract still guarantees
exactly-once across restarts (pinned by the two-run checkpoint test).

Scale: file listing happens once on the driver (same as Spark's own file
index); row parsing is executor-side Python — fine for landing ingest
(one-shot, IO-bound), wrong for the hot analytical path, which is why
bronze+ tables are parquet. Partitions are per-file; the landing layout
(one file per pollutant x day) naturally yields medium, even splits.
"""

from __future__ import annotations

import os
import re
import warnings

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from datalakes_and_data_integration_spark.sources.csv_landing import (
    RAW_COLUMNS,
)

_FILE_RE = re.compile(r"polluant-([^_/]+)_([0-9-]+)\.csv$")

_SCHEMA_DDL = ", ".join(f"{c} string" for c in RAW_COLUMNS) + (
    ", pollutant_code string, ingest_date string"
)


def _list_landing_files(path: str, pollutant: str | None) -> list[str]:
    """Conforming landing files under ``path``, sorted by name for a
    stable partition/offset order; ``pollutant`` prunes before listing
    returns (the prefix-scan semantics — S11/P8)."""
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            m = _FILE_RE.search(f)
            if not m:
                continue  # P8: nonconforming names never load
            if pollutant is not None and m.group(1) != pollutant:
                continue
            out.append(os.path.join(root, f))
    return sorted(out)


def _read_one_file(path: str):
    """Parse one landing CSV exactly like the reference: utf-8-sig decode
    (BOM swallowed), ';' delimiter, header skipped, filename-derived
    pollutant/date appended. Rows are padded/truncated to the declared
    width so header drift surfaces as nulls (P4), not a crash."""
    import csv

    m = _FILE_RE.search(path)
    code, date = m.group(1), m.group(2)
    width = len(RAW_COLUMNS)
    with open(path, encoding="utf-8-sig", newline="") as fh:
        rows = csv.reader(fh, delimiter=";")
        next(rows, None)  # header
        for row in rows:
            vals = row[:width] + [None] * (width - len(row))
            yield tuple(vals) + (code, date)


class LandingCSVDataSource(DataSource):
    """``spark.read.format("landing_csv").option("path", dir).load()``"""

    @classmethod
    def name(cls) -> str:
        return "landing_csv"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema):
        return _LandingCSVReader(self.options)

    def simpleStreamReader(self, schema):
        return _LandingCSVStreamReader(self.options)


class _LandingCSVReader(DataSourceReader):
    def __init__(self, options):
        self._path = options["path"]
        self._pollutant = options.get("pollutant")

    def partitions(self):
        return [
            InputPartition(p)
            for p in _list_landing_files(self._path, self._pollutant)
        ]

    def read(self, partition):
        yield from _read_one_file(partition.value)


class _LandingCSVStreamReader(SimpleDataSourceStreamReader):
    """Content-addressed offsets: the offset is the sorted list of
    processed file names (relative to the landing root), not a count.
    A positional count-offset silently skips a file that arrives later
    but sorts BEFORE already-processed names — exactly what the
    reference's re-fetch-last-3-days pipeline produces
    (`/root/reference/src/unpacked_to_raw.py:24-29` re-fetches earlier
    dates) — and re-slicing the live listing on replay shifts the slice
    if files were added/removed between commit and recovery. Name
    membership fixes both: a late early-sorting file is new (not in the
    set) and gets read; replay rebuilds paths FROM the committed offset,
    independent of the live listing, and a deleted replay file fails
    loudly instead of silently reading the wrong one.

    Offset size is O(processed files) — fine for a landing zone (one
    file per pollutant x day); at object-store scale the same contract
    would compact to (watermark-name, set of late names behind it).

    Legacy count-offset checkpoints ({"n_files": N}) are converted by
    file mtime, which REQUIRES monotonic write-once mtimes in the
    landing zone: files must land with fresh timestamps (direct write
    or default cp), never synced with preserved mtimes (rsync -a,
    cp -p, object-store sync). A provable mtime tie at the conversion
    boundary raises; a prefix disagreement with name order is warned
    with the differing files. Content-addressed offsets (everything
    after the first post-migration commit) have no such requirement."""

    def __init__(self, options):
        self._path = options["path"]
        self._pollutant = options.get("pollutant")

    def initialOffset(self):
        return {"processed": []}

    def _files(self) -> list[str]:
        return _list_landing_files(self._path, self._pollutant)

    def _rel(self, path: str) -> str:
        return os.path.relpath(path, self._path)

    def _processed(self, offset) -> set[str]:
        if "processed" in offset:
            return set(offset["processed"])
        # Legacy count-offset (pre content-addressing): n_files were
        # processed at commit time. Slicing the LIVE sorted listing
        # would mis-convert when a late-arriving file sorts before the
        # processed names (it lands inside the first n_files and gets
        # silently skipped). Landing files are write-once with fresh
        # mtimes, so every file present at the legacy commit has an
        # older mtime than any file added after it: the n_files
        # oldest-by-mtime files are exactly the set the legacy offset
        # described. That premise BREAKS for files landed with
        # preserved mtimes (rsync -a, cp -p, object-store sync) or
        # mtime ties at coarse filesystem granularity — cross-checks:
        # (a) an mtime TIE at the slice boundary makes the conversion
        # provably ambiguous -> raise rather than risk silently
        # classifying a post-checkpoint file as processed; (b) an
        # mtime-vs-name prefix disagreement is EXPECTED when a late
        # file sorts early (mtime is then the correct anchor — see
        # test_stream_legacy_offset_ignores_late_early_sorting_file)
        # but is also the preserved-mtime failure's signature, so the
        # warning names the differing files for the operator to audit.
        # The warning re-fires on every call that sees a legacy start
        # offset (readBetweenOffsets replays included) until read()'s
        # next commit persists the content-addressed form.
        n = offset["n_files"]
        files = sorted(self._files(), key=lambda p: (os.path.getmtime(p), p))
        if 0 < n < len(files) and (
            os.path.getmtime(files[n - 1]) == os.path.getmtime(files[n])
        ):
            raise ValueError(
                "landing_csv stream: legacy count-offset conversion is "
                f"ambiguous — files {self._rel(files[n - 1])!r} and "
                f"{self._rel(files[n])!r} tie on mtime at the "
                f"n_files={n} boundary (preserved mtimes or coarse "
                "mtime granularity). Restart the stream from a fresh "
                "checkpoint instead of risking silently skipped rows."
            )
        conv = {self._rel(p) for p in files[:n]}
        by_name = {self._rel(p) for p in sorted(self._files())[:n]}
        detail = (
            "; mtime prefix and name prefix agree"
            if conv == by_name
            else (
                f"; mtime prefix differs from name prefix (by-mtime-only "
                f"{sorted(conv - by_name)}, by-name-only "
                f"{sorted(by_name - conv)}) — correct iff these files "
                "landed after the legacy commit with fresh mtimes; "
                "WRONG if they were synced with preserved mtimes "
                "(rsync -a, cp -p)"
            )
        )
        warnings.warn(
            "landing_csv stream: converting legacy count-offset "
            f"(n_files={n}) to content-addressed form by file mtime"
            f"{detail}; the next commit persists file names.",
            stacklevel=2,
        )
        return conv

    def read(self, start):
        done = self._processed(start)
        new = [p for p in self._files() if self._rel(p) not in done]
        rows = [r for path in new for r in _read_one_file(path)]
        end = sorted(done | {self._rel(p) for p in new})
        return iter(rows), {"processed": end}

    def readBetweenOffsets(self, start, end):
        done = self._processed(start)
        batch = [n for n in self._processed(end) - done]
        # Rebuild paths from the committed offset — never from the live
        # listing. A missing file raises (FileNotFoundError) rather than
        # shifting the batch onto the wrong files.
        return iter(
            r
            for name in sorted(batch)
            for r in _read_one_file(os.path.join(self._path, name))
        )


def register_landing_source(spark) -> None:
    """Register the custom source on a session (idempotent)."""
    spark.dataSource.register(LandingCSVDataSource)
