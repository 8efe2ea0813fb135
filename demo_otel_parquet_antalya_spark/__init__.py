"""PySpark-native log-analytics lakehouse engine.

A from-scratch engine with the query and data-processing capabilities of
the reference OTel-Parquet lakehouse demo (Altinity/demo-otel-parquet-antalya,
surveyed in SURVEY.md): OTLP log ingestion -> flattening -> partitioned
Parquet -> incremental table registration -> full Spark SQL query surface,
plus large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).

Everything is idiomatic PySpark: DataFrame/SQL plans optimized by Catalyst,
Pandas UDFs only where built-ins cannot express the semantics.
"""

from demo_otel_parquet_antalya_spark.session import get_spark
from demo_otel_parquet_antalya_spark.schema import OTEL_LOGS_SCHEMA, OTLP_ENVELOPE_SCHEMA

__all__ = ["get_spark", "OTEL_LOGS_SCHEMA", "OTLP_ENVELOPE_SCHEMA"]

__version__ = "0.1.0"
