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


# --- selective compaction planner -----------------------------------------


def test_plan_compaction_properties():
    from datalakes_and_data_integration_spark.sources.sinks import (
        plan_compaction,
    )

    target = 1000
    sizes = {
        "big1": 900,  # >= 0.5*target: never touched
        "big2": 5000,
        "s1": 400,
        "s2": 400,
        "s3": 300,
        "s4": 100,
        "s5": 100,
        "lone": 499,
    }
    batches = plan_compaction(sizes, target_file_bytes=target)
    flat = [p for b in batches for p in b]
    # Only small files, each at most once, no singleton batches.
    assert len(flat) == len(set(flat))
    assert set(flat) <= {"s1", "s2", "s3", "s4", "s5", "lone"}
    for b in batches:
        assert len(b) > 1
        assert sum(sizes[p] for p in b) <= target
    # Everything small gets merged here (6 files fit in 2 bins of <=1000).
    assert set(flat) == {"s1", "s2", "s3", "s4", "s5", "lone"}


def test_plan_compaction_leaves_lone_small_file():
    from datalakes_and_data_integration_spark.sources.sinks import (
        plan_compaction,
    )

    assert plan_compaction({"big": 900, "lone": 10}, 1000) == []


def test_compact_selected_merges_in_place(spark, tmp_path):
    import os

    from datalakes_and_data_integration_spark.sources.sinks import (
        compact_selected,
        plan_compaction,
    )

    table = str(tmp_path / "t")
    # 8 tiny files.
    spark.range(800).selectExpr("id", "id * 2 AS v").repartition(
        8
    ).write.parquet(table)
    files = {
        os.path.join(table, f): os.path.getsize(os.path.join(table, f))
        for f in os.listdir(table)
        if f.endswith(".parquet")
    }
    before = spark.read.parquet(table).orderBy("id").collect()
    batches = plan_compaction(files, target_file_bytes=10**9)
    assert len(batches) == 1 and len(batches[0]) == 8
    compact_selected(spark, table, batches[0])
    n_parquet = sum(
        1 for f in os.listdir(table) if f.endswith(".parquet")
    )
    assert n_parquet == 1
    after = spark.read.parquet(table).orderBy("id").collect()
    assert after == before  # byte-for-byte same rows, fewer files
