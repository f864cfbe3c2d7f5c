"""CSV landing-zone reader (reference S5/S6/S11/S12, P4/P8).

The reference lists S3 objects by ``{pollutant_code}/`` prefix and parses
each with ``csv.reader(delimiter=';')`` after UTF-8 decode
(`/root/reference/src/preprocess_to_staging.py:113-130`), with the landing
key ``{code}/polluant-{code}_{date}.csv``
(`/root/reference/src/unpacked_to_raw.py:122-124`).

Spark restatement: one ``spark.read.csv`` over the landing directory with an
explicit schema; pollutant code and ingest date come from the file path via
``input_file_name()`` (S6's filename parser), and badly-named files are
excluded by glob (P8). Reading a pollutant subset prunes directories via
``pathGlobFilter`` — the engine-side equivalent of the prefix scan.

Scale: file listing is driver-side but parallelized by Spark for large dirs;
splits are per-file here (CSV is splittable only without multiline quoting);
at 100 TB the landing zone should be many medium files (100-500 MB), which
this layout produces naturally (one file per pollutant x day x fetch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The 23 raw columns, in CSV order, with their raw French headers
# (reference DDL preprocess_to_staging.py:82-110 / FIXTURES.md §1).
RAW_COLUMNS: list[str] = [
    "date_de_debut",
    "date_de_fin",
    "organisme",
    "code_zas",
    "zas",
    "code_site",
    "nom_site",
    "type_d_implantation",
    "polluant",
    "type_d_influence",
    "discriminant",
    "reglementaire",
    "type_d_evaluation",
    "procedure_de_mesure",
    "type_de_valeur",
    "valeur",
    "valeur_brute",
    "unite_de_mesure",
    "taux_de_saisie",
    "couverture_temporelle",
    "couverture_de_donnees",
    "code_qualite",
    "validite",
]

RAW_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in RAW_COLUMNS]
)

# polluant-{code}_{date}.csv — the filename contract (unpacked_to_raw.py:
# 213-228); nonconforming files are skipped there, here excluded by glob.
_FILE_GLOB = "polluant-*_*.csv"
_CODE_RE = r"polluant-([^_/]+)_"
_DATE_RE = r"polluant-[^_/]+_([0-9-]+)\.csv"


def read_landing_csv(
    spark: SparkSession,
    landing_dir: str,
    pollutant_code: str | None = None,
) -> DataFrame:
    """Read raw measurement CSVs with landing-path metadata columns.

    All 23 columns land as strings (typing happens in silver, mirroring the
    reference's parse-then-convert split). The header row is skipped by name
    count — the explicit schema makes header drift a visible null-row, the
    P4 analogue of skip-with-warning.
    """
    glob = (
        f"polluant-{pollutant_code}_*.csv" if pollutant_code else _FILE_GLOB
    )
    df = (
        spark.read.schema(RAW_SCHEMA)
        .option("sep", ";")
        .option("header", True)  # consumes the (BOM-carrying) header line
        .option("encoding", "UTF-8")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", True)
        .csv(landing_dir)
    )
    fname = F.input_file_name()
    return df.withColumn(
        "pollutant_code", F.regexp_extract(fname, _CODE_RE, 1)
    ).withColumn("ingest_date", F.regexp_extract(fname, _DATE_RE, 1))
