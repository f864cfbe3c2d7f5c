"""Z-order layout test: after zorder_layout, each parquet file's min/max
range narrows on BOTH clustering columns (the stats parquet row-group
pruning uses), vs. an unsorted write where every file spans everything."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from datalakes_and_data_integration_spark.operators.layout import zorder_layout


def _avg_span(path_glob, col, total_span):
    spans = []
    for f in glob.glob(path_glob):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            spans.append((hi - lo) / total_span)
    return sum(spans) / len(spans)


def test_zorder_narrows_file_ranges(spark, tmp_path):
    # 2-D grid: x and y independent; unsorted files span ~everything.
    n = 64
    df = spark.createDataFrame(
        [(i % n, (i * 7919) % n) for i in range(n * n)], ["x", "y"]
    )
    plain, zdir = str(tmp_path / "plain"), str(tmp_path / "zorder")
    df.repartition(8).write.parquet(plain)
    zorder_layout(df, ["x", "y"], n_files=8).write.parquet(zdir)

    span = n - 1
    for col in ("x", "y"):
        plain_span = _avg_span(f"{plain}/*.parquet", col, span)
        z_span = _avg_span(f"{zdir}/*.parquet", col, span)
        # every dimension narrows substantially (8 files, 2 dims -> each
        # file should cover well under half the domain per dimension)
        assert z_span < 0.6 < plain_span, (col, z_span, plain_span)


def test_compact_parquet_merges_small_files(spark, tmp_path):
    from datalakes_and_data_integration_spark.sources.sinks import (
        compact_parquet,
    )

    table = str(tmp_path / "frag")
    df = spark.createDataFrame([(i, f"v{i}") for i in range(5000)], ["k", "v"])
    df.repartition(40).write.parquet(table)  # 40 tiny files
    before = len(glob.glob(f"{table}/*.parquet"))
    assert before == 40
    rows_before = {tuple(r) for r in spark.read.parquet(table).collect()}

    n_after = compact_parquet(spark, table, target_file_bytes=10 * 1024 * 1024)
    assert n_after < before and n_after >= 1
    assert len(glob.glob(f"{table}/*.parquet")) == n_after
    rows_after = {tuple(r) for r in spark.read.parquet(table).collect()}
    assert rows_after == rows_before  # data identical
