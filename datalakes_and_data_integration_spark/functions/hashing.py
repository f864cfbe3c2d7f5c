"""Deterministic cross-engine hashing.

Everything that must hash identically in Spark and in the DuckDB oracle goes
through md5 (bit-identical hex in every engine), never through engine-native
``hash()``/``xxhash64`` (different algorithms/seeds per engine).

A "hash60" is the first 15 hex chars of md5 as a non-negative int64
(60 bits < 2^63, so it parses as a signed BIGINT everywhere):

- Spark:  CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
- DuckDB: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)

Seeded variants prepend ``"{seed}|"`` to the input, giving a family of
independent hash functions for MinHash / SimHash / LSH from one primitive.

Python's hashlib.md5 is the same function, so constants derived at
plan-build time (e.g. LSH hyperplane signs) are consistent with both engines
by construction.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash60(col: Column | str) -> Column:
    """60-bit md5-derived hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def hash60_seeded(col: Column | str, seed: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return hash60(F.concat(F.lit(f"{seed}|"), c))


def hash60_sql_spark(expr: str, seed: int | None = None) -> str:
    """The same hash as a Spark SQL expression string (for use in lambdas
    inside transform()/aggregate(), where Column objects can't reach)."""
    s = expr if seed is None else f"concat('{seed}|', {expr})"
    return f"CAST(conv(substr(md5({s}), 1, 15), 16, 10) AS BIGINT)"


def hash60_sql_duck(expr: str, seed: int | None = None) -> str:
    """The same hash in DuckDB SQL (for oracle strings)."""
    s = expr if seed is None else f"concat('{seed}|', {expr})"
    return f"CAST('0x' || substr(md5({s}), 1, 15) AS BIGINT)"


def hash60_py(value: str, seed: int | None = None) -> int:
    """Plan-build-time twin of hash60 (e.g. for embedded LSH constants)."""
    s = value if seed is None else f"{seed}|{value}"
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
