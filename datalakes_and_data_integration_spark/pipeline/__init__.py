"""The medallion pipeline: the reference's three-zone architecture
(raw S3 -> Cassandra staging -> TimescaleDB curated, SURVEY.md §3) rebuilt
as bronze -> silver -> gold parquet zones driven by one Spark job per zone
transition (SURVEY.md §3.4).
"""

from datalakes_and_data_integration_spark.pipeline.bronze import build_bronze
from datalakes_and_data_integration_spark.pipeline.silver import build_silver
from datalakes_and_data_integration_spark.pipeline.gold import build_gold

__all__ = ["build_bronze", "build_silver", "build_gold"]
