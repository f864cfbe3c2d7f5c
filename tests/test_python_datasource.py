"""Custom Python DataSource (landing_csv / landing_csv_stream): batch
parity with the built-in CSV reader, source-level pollutant pruning, and
exactly-once incremental pickup of new landing files."""

from __future__ import annotations

import os
import tempfile

_HEADER = (
    "﻿Date de début;Date de fin;Organisme;code zas;Zas;code site;"
    "nom site;type d'implantation;Polluant;type d'influence;discriminant;"
    "Réglementaire;type d'évaluation;procédure de mesure;type de valeur;"
    "valeur;valeur brute;unité de mesure;taux de saisie;"
    "couverture temporelle;couverture de données;code qualité;validité"
)


def _write_landing(dirpath: str, code: str, date: str, values: list[float]):
    lines = [_HEADER]
    for i, v in enumerate(values):
        cells = [""] * 23
        cells[0] = f"2024/01/0{i + 1} 00:00:00"
        cells[8] = code
        cells[15] = str(v)
        cells[17] = "µg-m3"
        lines.append(";".join(cells))
    path = os.path.join(dirpath, f"polluant-{code}_{date}.csv")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")
    return path


def test_batch_parity_and_pruning(spark):
    from datalakes_and_data_integration_spark.sources.csv_landing import (
        read_landing_csv,
    )
    from datalakes_and_data_integration_spark.sources.python_datasource import (
        register_landing_source,
    )

    landing = tempfile.mkdtemp(prefix="pyds_landing_")
    _write_landing(landing, "03", "2024-01-05", [1.5, 2.5])
    _write_landing(landing, "24", "2024-01-05", [7.0])
    # Nonconforming name: must be invisible to both readers (P8).
    with open(os.path.join(landing, "notes.csv"), "w") as fh:
        fh.write("junk;file\n1;2\n")

    register_landing_source(spark)
    pyds = (
        spark.read.format("landing_csv").option("path", landing).load()
    )
    native = read_landing_csv(spark, landing)

    cols = ["date_de_debut", "polluant", "valeur", "unite_de_mesure",
            "pollutant_code", "ingest_date"]
    got = sorted(tuple(r) for r in pyds.select(*cols).collect())
    want = sorted(tuple(r) for r in native.select(*cols).collect())
    assert got == want and len(got) == 3

    # Source-level pruning: only the requested pollutant's file is read.
    pruned = (
        spark.read.format("landing_csv")
        .option("path", landing)
        .option("pollutant", "03")
        .load()
    )
    assert pruned.count() == 2
    assert pruned.select("pollutant_code").distinct().collect()[0][0] == "03"
    # Pruning happens at partition planning: one partition for one file.
    assert pruned.rdd.getNumPartitions() == 1


def test_stream_incremental_exactly_once(spark):
    from datalakes_and_data_integration_spark.sources.python_datasource import (
        register_landing_source,
    )

    landing = tempfile.mkdtemp(prefix="pyds_stream_")
    ckpt = tempfile.mkdtemp(prefix="pyds_ckpt_")
    out = tempfile.mkdtemp(prefix="pyds_out_")
    _write_landing(landing, "03", "2024-01-05", [1.0, 2.0])
    register_landing_source(spark)

    # Memory sink cannot recover a checkpoint; the parquet sink can — and
    # a restartable file sink is the realistic landing-ingest shape anyway.
    def run_once():
        q = (
            spark.readStream.format("landing_csv")
            .option("path", landing)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out)

    first = run_once().collect()
    assert len(first) == 2

    # A new landing file arrives; the SAME checkpoint picks up ONLY it —
    # the sink now holds old + new with no re-read of the first file.
    _write_landing(landing, "24", "2024-01-06", [9.0])
    second = run_once().collect()
    assert len(second) == 3
    by_code = sorted(r.pollutant_code for r in second)
    assert by_code == ["03", "03", "24"]


def test_stream_legacy_count_offset_conversion():
    """A checkpoint written by the old positional count-offset format
    ({"n_files": N}) must resume correctly: the N files present at the
    legacy commit (= the N oldest by mtime — landing files are
    write-once) count as processed, and read()/readBetweenOffsets emit
    content-addressed offsets from then on."""
    import warnings

    from datalakes_and_data_integration_spark.sources.python_datasource import (
        _LandingCSVStreamReader,
    )

    landing = tempfile.mkdtemp(prefix="pyds_legacy_")
    p1 = _write_landing(landing, "03", "2024-01-05", [1.0])
    p2 = _write_landing(landing, "24", "2024-01-06", [2.0, 3.0])
    os.utime(p1, (1_700_000_000, 1_700_000_000))
    os.utime(p2, (1_700_000_100, 1_700_000_100))
    reader = _LandingCSVStreamReader({"path": landing})

    # Legacy offset saying "one file processed at commit": only the
    # second (newer) file's rows come back, the new offset is
    # name-based, and the one-time migration warns.
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rows, end = reader.read({"n_files": 1})
    assert any("legacy count-offset" in str(x.message) for x in w)
    rows = list(rows)
    assert [r[8] for r in rows] == ["24", "24"]  # Polluant cell
    assert sorted(end) == ["processed"]
    assert len(end["processed"]) == 2

    # Replay between a legacy start and a content-addressed end.
    replay = list(reader.readBetweenOffsets({"n_files": 1}, end))
    assert [r[8] for r in replay] == ["24", "24"]

    # Fully-caught-up legacy offset: nothing new.
    rows2, _ = reader.read({"n_files": 2})
    assert list(rows2) == []


def test_stream_legacy_offset_ignores_late_early_sorting_file():
    """The migration-boundary hazard the mtime anchor exists for: a
    file that lands AFTER the legacy checkpoint committed but sorts
    BEFORE the processed names must still be read. A pure
    listing-position conversion counts it inside the first n_files and
    silently skips it."""
    from datalakes_and_data_integration_spark.sources.python_datasource import (
        _LandingCSVStreamReader,
    )

    landing = tempfile.mkdtemp(prefix="pyds_legacy_late_")
    # Processed before the legacy commit: the "24" file (sorts LAST).
    p_old = _write_landing(landing, "24", "2024-01-06", [2.0])
    # Landed after the commit: the "03" file (sorts FIRST, newer mtime).
    p_new = _write_landing(landing, "03", "2024-01-05", [1.0])
    os.utime(p_old, (1_700_000_000, 1_700_000_000))
    os.utime(p_new, (1_700_000_100, 1_700_000_100))
    reader = _LandingCSVStreamReader({"path": landing})

    rows, end = reader.read({"n_files": 1})
    rows = list(rows)
    # mtime anchor: the late "03" file is NEW and gets read exactly
    # once; a positional slice would have returned the "24" rows again.
    assert [r[8] for r in rows] == ["03"]
    assert len(end["processed"]) == 2


def test_stream_legacy_offset_mtime_tie_raises():
    """Preserved-mtime landings (rsync -a, cp -p) or coarse mtime
    granularity can tie two files at the legacy-slice boundary; the
    conversion is then provably ambiguous and must fail loudly instead
    of silently classifying a post-checkpoint file as processed."""
    import pytest

    from datalakes_and_data_integration_spark.sources.python_datasource import (
        _LandingCSVStreamReader,
    )

    landing = tempfile.mkdtemp(prefix="pyds_legacy_tie_")
    p1 = _write_landing(landing, "03", "2024-01-05", [1.0])
    p2 = _write_landing(landing, "24", "2024-01-06", [2.0])
    os.utime(p1, (1_700_000_000, 1_700_000_000))
    os.utime(p2, (1_700_000_000, 1_700_000_000))  # tie at the boundary
    reader = _LandingCSVStreamReader({"path": landing})
    with pytest.raises(ValueError, match="ambiguous"):
        reader.read({"n_files": 1})


def test_stream_late_file_sorting_before_processed(spark):
    """Content-addressed offsets: a file that ARRIVES later but SORTS
    before already-processed names (the reference's re-fetch of an
    earlier date) must still be read exactly once. A positional
    count-offset silently skips it and double-reads the trailing file."""
    from datalakes_and_data_integration_spark.sources.python_datasource import (
        register_landing_source,
    )

    landing = tempfile.mkdtemp(prefix="pyds_late_")
    ckpt = tempfile.mkdtemp(prefix="pyds_late_ckpt_")
    out = tempfile.mkdtemp(prefix="pyds_late_out_")
    # 'polluant-24_...' sorts AFTER 'polluant-03_...': process it first.
    _write_landing(landing, "24", "2024-01-06", [9.0])
    register_landing_source(spark)

    def run_once():
        q = (
            spark.readStream.format("landing_csv")
            .option("path", landing)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out)

    assert len(run_once().collect()) == 1

    # Late arrival that sorts BEFORE the processed file.
    _write_landing(landing, "03", "2024-01-05", [1.0, 2.0])
    rows = run_once().collect()
    assert sorted(r.pollutant_code for r in rows) == ["03", "03", "24"]
    # Exactly-once: the '24' file was NOT re-read.
    assert len([r for r in rows if r.pollutant_code == "24"]) == 1
