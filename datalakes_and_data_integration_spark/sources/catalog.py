"""Dataset registry + catalog scan (reference S13/S14/S16, config).

The reference drives everything from ``config/pollutants.yaml`` (5 active
pollutants: `/root/reference/config/pollutants.yaml:2-21`) and discovers
staging tables with a system-schema scan
(`/root/reference/src/process_to_curated.py:9-16`). Here the registry is the
same shape, and "tables" are directories under a zone root, listed from the
filesystem (or ``spark.catalog.listTables`` when a metastore is attached).
"""

from __future__ import annotations

import os

from datalakes_and_data_integration_spark.operators.normalize import (
    normalize_column_name,
)

# (code, short_name, full_name, unit) — mirrors pollutants.yaml's active set.
ACTIVE_POLLUTANTS: list[dict[str, str]] = [
    {"code": "01", "short_name": "SO2", "full_name": "dioxyde de soufre", "unit": "µg-m3"},
    {"code": "03", "short_name": "NO2", "full_name": "dioxyde d'azote", "unit": "µg-m3"},
    {"code": "04", "short_name": "CO", "full_name": "monoxyde de carbone", "unit": "mg-m3"},
    {"code": "08", "short_name": "O3", "full_name": "ozone", "unit": "µg-m3"},
    {"code": "12", "short_name": "NOX", "full_name": "oxydes d'azote", "unit": "µg-m3"},
]

# Unit -> g/L factors; unmapped units (e.g. the µg/m3 variant) -> null
# (reference process_to_curated.py:35-39).
UNIT_FACTORS: dict[str, float] = {
    "mg-m3": 1e-3,
    "µg-m3": 1e-6,
    "ng-m3": 1e-9,
}


def table_name_for(short_name: str) -> str:
    """Staging table name = normalized short name (preprocess_to_staging.py:
    155): SO2 -> so2, PM2.5 -> pm2_5."""
    return normalize_column_name(short_name)


# pollutant code ("01") -> staging table name ("so2"); the reference keys the
# raw zone by code but names staging tables by short name.
CODE_TO_TABLE: dict[str, str] = {
    p["code"]: table_name_for(p["short_name"]) for p in ACTIVE_POLLUTANTS
}


def list_tables(zone_dir: str) -> list[str]:
    """Discover tables in a zone directory (S16's catalog scan). Sorted for
    deterministic downstream merge order — the reference's order was
    unspecified Cassandra catalog order (SURVEY.md §7.4)."""
    if not os.path.isdir(zone_dir):
        return []
    return sorted(
        d for d in os.listdir(zone_dir)
        if os.path.isdir(os.path.join(zone_dir, d)) and not d.startswith(("_", "."))
    )
