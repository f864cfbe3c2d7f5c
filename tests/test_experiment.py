"""Experimentation-family regressions beyond the sf-fixture oracle gate.

The round-9 ADVICE finding: with per-user sums carrying >3 decimal
digits, DECIMAL(28,6) CUPED operands made Spark's x*x overflow the
38-digit ceiling (product wants (57,12) -> rounded to scale 6) while
DuckDB computed the exact product — sxx/sxy/syy forked cross-engine.
The fix keeps x/y at DECIMAL(18,6) (products (37,12)/(36,12), exact in
both engines). This test pins it on a fixture DESIGNED to trip the old
code: values are multiples of 2^-6 = 0.015625 (exact as IEEE doubles
AND as 6-scale decimals), so per-user sums carry 6 significant decimal
digits and any product rounding diverges immediately.
"""

from __future__ import annotations

import os

import duckdb
import pytest


def _mk_events(tmpdir: str) -> str:
    """40 users x 30 events over 30 days; value = k + m * 2^-6."""
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT (u * 1000 + i)::BIGINT AS event_id,
                 TIMESTAMP '2024-01-01'
                   + INTERVAL (i) DAY
                   + INTERVAL ((u * 37 + i * 13) % 1440) MINUTE AS ts,
                 u::BIGINT AS user_id,
                 CASE WHEN (u + i) % 3 = 0 THEN 'purchase'
                      ELSE 'view' END AS event_type,
                 ((u * 7 + i * 3) % 200)::DOUBLE
                   + (((u * 11 + i) % 64)::DOUBLE) * 0.015625 AS value,
                 '{{}}' AS props
          FROM range(40) t(u), range(30) s(i)
        ) TO '{tmpdir}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return tmpdir


def test_cuped_moments_hash_exact_on_rich_decimals(spark, tmp_path):
    from datalakes_and_data_integration_spark.plans.experiment import (
        _cuped_oracle,
        ab_metric_cuped_adjustment,
    )

    sf_dir = _mk_events(str(tmp_path))
    got = {
        r.arm: r for r in ab_metric_cuped_adjustment(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'events.parquet')}')"
    )
    cols = [
        "n_users",
        "theta",
        "mean_y",
        "mean_y_cuped",
        "var_y",
        "var_y_cuped",
    ]
    want = {
        r[0]: dict(zip(cols, r[1:]))
        for r in con.execute(_cuped_oracle()).fetchall()
    }
    con.close()
    assert set(got) == set(want) == {"control", "treatment"}
    for arm in got:
        for c in cols:
            assert getattr(got[arm], c) == pytest.approx(
                want[arm][c], abs=0
            ), (arm, c, getattr(got[arm], c), want[arm][c])
    # the fixture really does exercise >3 decimal digits per user sum
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'events.parquet')}')"
    )
    frac = con.execute(
        """
        SELECT max(length(split_part(CAST(s AS VARCHAR), '.', 2)))
        FROM (SELECT sum(CAST(value AS DECIMAL(18,6))) AS s
              FROM events GROUP BY user_id)
        """
    ).fetchone()[0]
    con.close()
    assert frac >= 5, "fixture lost its rich-decimal property"


def test_ztest_reconciles_with_srm_audit_counts(spark):
    """The z-test's four counts must equal the SRM audit's per-arm
    enrolled/converter counts (shared frame, different rollup), the CI
    must bracket the lift, and the significance flag must equal
    |z| > 1.959964."""
    SF = "/root/testdata/sf0.001"
    from datalakes_and_data_integration_spark.plans.experiment import (
        ab_assignment_srm_audit,
        ab_proportion_ztest,
    )

    z = ab_proportion_ztest(spark, SF).collect()[0]
    srm = {r.arm: r for r in ab_assignment_srm_audit(spark, SF).collect()}
    assert z.n_control == srm["control"].n_users
    assert z.n_treatment == srm["treatment"].n_users
    assert z.conv_control == srm["control"].n_converters
    assert z.conv_treatment == srm["treatment"].n_converters
    assert z.ci_lo <= z.lift <= z.ci_hi
    assert z.significant_95 == (abs(z.z_score) > 1.959964)
    assert abs(z.lift - (z.rate_treatment - z.rate_control)) < 2e-6


def test_mann_whitney_matches_direct_python_recompute(spark):
    """U and z must equal a from-scratch Python Mann-Whitney on the
    same per-user metric (midranks, tie-corrected normal z) — the
    Spearman-recompute precedent applied to the rank-sum test."""
    import math

    from pyspark.sql import functions as F

    from datalakes_and_data_integration_spark.plans.experiment import (
        _ab_per_user,
        _exp_start,
        ab_mann_whitney_u,
    )
    from datalakes_and_data_integration_spark.plans._util import T

    SF = "/root/testdata/sf0.001"
    got = ab_mann_whitney_u(spark, SF).collect()[0]
    ev = T(spark, SF, "events")
    rows = (
        _ab_per_user(ev, _exp_start(ev))
        .select("arm", F.col("y").cast("string"))
        .collect()
    )
    from decimal import Decimal

    vals = [(r.arm, Decimal(r.y)) for r in rows]
    ordered = sorted(v for _, v in vals)
    # midranks per distinct value
    ranks: dict = {}
    i = 0
    while i < len(ordered):
        j = i
        while j < len(ordered) and ordered[j] == ordered[i]:
            j += 1
        ranks[ordered[i]] = (i + 1 + j) / 2  # avg of ranks i+1..j
        i = j
    nt = sum(1 for a, _ in vals if a == "treatment")
    nc = len(vals) - nt
    rt = sum(ranks[v] for a, v in vals if a == "treatment")
    u = rt - nt * (nt + 1) / 2
    assert got.n_control == nc and got.n_treatment == nt
    assert got.u_treatment == u
    n = nc + nt
    from collections import Counter

    tsum = sum(c**3 - c for c in Counter(ordered).values())
    assert got.tie_term == tsum
    var = (nc * nt / 12) * ((n + 1) - tsum / (n * (n - 1)))
    z = (u - nc * nt / 2) / math.sqrt(var)
    assert abs(got.z_score - z) < 2e-6
    assert got.significant_95 == (abs(z) > 1.959964)
