from demo_otel_parquet_antalya_spark.plans.registry import QUERIES, QuerySpec

# importing the module registers its queries into QUERIES
from demo_otel_parquet_antalya_spark.plans import northstar as _northstar  # noqa: E402,F401

__all__ = ["QUERIES", "QuerySpec"]
