"""The driver verifies the FIRST 50 entries of queries() each round
(CORRECTNESS_r01/r02.json are exactly that prefix). Since round 3 the
window is an explicit list — registry.WINDOW_PRIORITY — instead of
module-import order, so adding queries anywhere can no longer silently
evict a window occupant. These tests keep the rotation honest:
every priority name must exist and carry an oracle (a no-oracle entry
would be a guaranteed `err` row in CORRECTNESS), and the no-oracle
queries must all sit behind position 50."""

from __future__ import annotations

WINDOW = 50


def test_window_priority_names_are_registered_and_oracled():
    from datalakes_and_data_integration_spark.plans import QUERIES
    from datalakes_and_data_integration_spark.plans.registry import (
        WINDOW_PRIORITY,
    )

    assert len(WINDOW_PRIORITY) == WINDOW
    assert len(set(WINDOW_PRIORITY)) == WINDOW
    missing = [n for n in WINDOW_PRIORITY if n not in QUERIES]
    assert not missing, f"WINDOW_PRIORITY names not registered: {missing}"
    no_oracle = [n for n in WINDOW_PRIORITY if QUERIES[n].oracle is None]
    assert not no_oracle, (
        f"no-oracle queries in the driver window (guaranteed err rows): "
        f"{no_oracle}"
    )


def test_driver_window_is_the_priority_list():
    from datalakes_and_data_integration_spark.plans import all_queries
    from datalakes_and_data_integration_spark.plans.registry import (
        WINDOW_PRIORITY,
    )

    names = list(all_queries())
    assert len(names) >= WINDOW
    assert names[:WINDOW] == WINDOW_PRIORITY


def test_no_oracle_queries_sit_behind_the_window():
    from datalakes_and_data_integration_spark.plans import (
        QUERIES,
        all_queries,
    )

    names = list(all_queries())
    in_window = [
        n for n in names[:WINDOW] if QUERIES[n].oracle is None
    ]
    assert not in_window


def test_window_follows_changed_plus_oldest_policy():
    """Standing rotation policy (round 6): the window is (a) every query
    in registry.ROUND_CHANGED, then (b) the oldest-green-first cohort.
    Recomputed from the CORRECTNESS_r*.json rows older than WINDOW_ROUND,
    so a rotation that skips an old query in favor of a fresher one
    fails here. If CORRECTNESS files >= WINDOW_ROUND exist, the window
    is STALE: bump WINDOW_ROUND, refresh ROUND_CHANGED with this round's
    changed queries, and rebuild the list (oldest cohort first)."""
    import glob
    import json
    import os
    import re
    import warnings

    from datalakes_and_data_integration_spark.plans import QUERIES
    from datalakes_and_data_integration_spark.plans.registry import (
        ROUND_CHANGED,
        WINDOW_PRIORITY,
        WINDOW_ROUND,
    )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    stale = []
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        if rnd >= WINDOW_ROUND:
            stale.append(os.path.basename(path))
            continue
        for name in json.load(open(path)):
            latest[name] = max(latest.get(name, 0), rnd)
    if stale:
        warnings.warn(
            f"driver rounds {stale} landed after WINDOW_ROUND="
            f"{WINDOW_ROUND}: rotate WINDOW_PRIORITY (changed + oldest "
            "cohort) and bump WINDOW_ROUND/ROUND_CHANGED."
        )

    assert set(ROUND_CHANGED) <= set(WINDOW_PRIORITY)
    window = set(WINDOW_PRIORITY)
    non_changed = [n for n in WINDOW_PRIORITY if n not in set(ROUND_CHANGED)]
    outside = [
        n
        for n in QUERIES
        if n not in window and QUERIES[n].oracle is not None
    ]
    # An all-changed window (every slot consumed by clause (a)) satisfies
    # the oldest-first clause trivially — there are no cohort slots whose
    # occupants could out-prioritize anything left outside.
    worst_in = max((latest.get(n, 0) for n in non_changed), default=0)
    best_out = min(latest.get(n, 0) for n in outside)
    assert best_out >= worst_in, (
        f"window slot holds a query with a newer green row (r{worst_in}) "
        f"than a query left outside (r{best_out}) — the oldest-first "
        "clause is violated: "
        f"in={[n for n in non_changed if latest.get(n, 0) == worst_in]} "
        f"out={[n for n in outside if latest.get(n, 0) == best_out]}"
    )


def test_every_query_has_unique_columns_contract():
    """Oracle entries exist only for registered queries; no orphans."""
    from datalakes_and_data_integration_spark.plans import (
        all_oracle_sql,
        all_queries,
    )

    q = set(all_queries())
    o = set(all_oracle_sql())
    assert o <= q
