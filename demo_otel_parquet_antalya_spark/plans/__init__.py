from demo_otel_parquet_antalya_spark.plans.registry import QUERIES, QuerySpec

__all__ = ["QUERIES", "QuerySpec"]
