"""Schema evolution: reading a table whose files span schema generations.

A long-lived lake table accretes schema changes — columns appear, int
counters outgrow 32 bits, floats widen. The reference sidesteps this with
one hand-declared schema per zone (csv_landing.RAW_SCHEMA); an engine a
reference user migrates TO must read the history it will accumulate.

Spark's ``mergeSchema=true`` only merges DISJOINT additions — two
generations that disagree on a column's physical type (int32 vs int64)
fail the footer merge outright. The general recipe is therefore
per-generation conform-then-union:

- each generation is read with its own footer schema (full predicate
  pushdown and column pruning per branch — the union is a union of
  scans, no shuffle, no repartition);
- ``conform`` aligns every branch to the target: missing columns become
  typed nulls, extra columns are dropped (or rejected), and type changes
  are applied ONLY when they widen losslessly (int->long, float->double,
  decimal scale/precision growth). Narrowing raises instead of silently
  truncating — a 100 TB read that corrupts values is worse than one that
  fails.

``schema_diff`` is the audit half: what changed between two generations,
as data (the input a migration review or a quarantine decision acts on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as t

# Lossless widenings Spark casts without value change. Anything else that
# differs is a narrowing (or a semantic change) and must be explicit.
_WIDENINGS: dict[tuple[str, str], bool] = {
    ("tinyint", "smallint"): True,
    ("tinyint", "int"): True,
    ("tinyint", "bigint"): True,
    ("smallint", "int"): True,
    ("smallint", "bigint"): True,
    ("int", "bigint"): True,
    ("float", "double"): True,
    ("date", "timestamp"): True,
    ("date", "timestamp_ntz"): True,
}


def _widens(src: t.DataType, dst: t.DataType) -> bool:
    if isinstance(src, t.DecimalType) and isinstance(dst, t.DecimalType):
        # Growing precision while keeping >= scale headroom is lossless.
        return (
            dst.scale >= src.scale
            and dst.precision - dst.scale >= src.precision - src.scale
        )
    if isinstance(src, (t.ByteType, t.ShortType, t.IntegerType, t.LongType)) and isinstance(
        dst, t.DecimalType
    ):
        return dst.precision - dst.scale >= 20  # covers int64
    return _WIDENINGS.get((src.simpleString(), dst.simpleString()), False)


def conform(
    df: DataFrame, target: t.StructType, on_extra: str = "drop"
) -> DataFrame:
    """Project ``df`` onto ``target``: typed nulls for missing columns,
    widening casts for retyped ones, extras dropped or rejected.

    Raises ``ValueError`` on a narrowing/incompatible retype or (with
    ``on_extra='error'``) on unexpected columns. Pure projection — adds
    no exchange, keeps pushdown on the underlying scan.
    """
    have = {f.name: f.dataType for f in df.schema.fields}
    want = {f.name: f.dataType for f in target.fields}
    if on_extra not in ("drop", "error"):
        raise ValueError(f"on_extra must be 'drop' or 'error': {on_extra}")
    extras = [c for c in have if c not in want]
    if extras and on_extra == "error":
        raise ValueError(f"unexpected columns: {extras}")
    cols = []
    for f in target.fields:
        if f.name not in have:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            continue
        src = have[f.name]
        if src == f.dataType:
            cols.append(F.col(f.name))
        elif _widens(src, f.dataType):
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            raise ValueError(
                f"refusing non-widening retype of '{f.name}': "
                f"{src.simpleString()} -> {f.dataType.simpleString()}"
            )
    return df.select(*cols)


def read_evolved(
    spark: SparkSession,
    paths: list[str],
    target: t.StructType,
    on_extra: str = "drop",
) -> DataFrame:
    """Union ``paths`` (one per schema generation) conformed to ``target``.

    Each branch scans with its own footer schema, so filters and column
    pruning push into every generation independently; the union is
    plan-level (no shuffle). Use instead of ``mergeSchema`` whenever any
    column's physical type changed across generations.
    """
    if not paths:
        raise ValueError("read_evolved needs at least one path")
    out = None
    for p in paths:
        branch = conform(spark.read.parquet(p), target, on_extra=on_extra)
        out = branch if out is None else out.unionByName(branch)
    return out


def schema_diff(old: t.StructType, new: t.StructType) -> list[dict]:
    """Field-level change list between two schema generations.

    One dict per changed column: ``{"column", "change", "from", "to"}``
    with change in {added, removed, retyped}; retyped rows also carry
    ``"widening": bool`` — the signal that separates a safe rolling read
    from one that needs a migration.
    """
    o = {f.name: f.dataType for f in old.fields}
    n = {f.name: f.dataType for f in new.fields}
    diff: list[dict] = []
    for name in o:
        if name not in n:
            diff.append(
                {
                    "column": name,
                    "change": "removed",
                    "from": o[name].simpleString(),
                    "to": None,
                }
            )
        elif o[name] != n[name]:
            diff.append(
                {
                    "column": name,
                    "change": "retyped",
                    "from": o[name].simpleString(),
                    "to": n[name].simpleString(),
                    "widening": _widens(o[name], n[name]),
                }
            )
    for name in n:
        if name not in o:
            diff.append(
                {
                    "column": name,
                    "change": "added",
                    "from": None,
                    "to": n[name].simpleString(),
                }
            )
    return diff
