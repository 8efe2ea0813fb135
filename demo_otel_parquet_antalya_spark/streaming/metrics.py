"""Pipeline observability: ``observe()`` metrics on ingest dataflows.

The reference monitors its pipeline with Grafana panels over the landed
data (SURVEY.md §2.A14); Spark's Observation API gives the same numbers
WITHOUT a second scan — named aggregates piggyback on the job that's
already running and surface on the driver when the action completes
(batch) or per micro-batch via StreamingQueryListener (streaming).

Metrics chosen to mirror the reference's dashboard tiles: row volume,
dropped/defaulted timestamps, severity error share, event-time bounds
(freshness = wall clock - max event time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def _metric_columns() -> list:
    return [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("timestamp").isNull(), 1).otherwise(0)).alias("null_ts"),
        F.sum(F.when(F.col("severity_text") == "ERROR", 1).otherwise(0)).alias("n_errors"),
        F.max("timestamp").alias("max_event_time"),
    ]


def observe_ingest(df: DataFrame, name: str = "ingest_metrics"):
    """Attach ingest metrics to a BATCH frame: returns (df, Observation).

    ``observation.get`` blocks until the first action on ``df`` finishes,
    then yields the dict — zero extra passes over the data.
    """
    obs = Observation(name)
    return df.observe(obs, *_metric_columns()), obs


def observe_ingest_stream(df: DataFrame, name: str = "ingest_metrics") -> DataFrame:
    """Attach the same metrics to a STREAMING frame; values arrive on each
    micro-batch's QueryProgressEvent (``progress.observedMetrics[name]``)."""
    return df.observe(name, *_metric_columns())


def collect_stream_metrics(spark, name: str = "ingest_metrics") -> "MetricsListener":
    """Register (and return) a listener accumulating observed metrics rows
    per micro-batch. Call ``.rows`` after the query finishes; remember to
    ``spark.streams.removeListener(listener)``."""
    listener = MetricsListener(name)
    spark.streams.addListener(listener)
    return listener


try:  # pragma: no cover - import surface depends on deploy mode
    from pyspark.sql.streaming import StreamingQueryListener

    class MetricsListener(StreamingQueryListener):
        def __init__(self, name: str):
            self._name = name
            self.rows: list[dict] = []

        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            om = event.progress.observedMetrics
            if self._name in om:
                self.rows.append(om[self._name].asDict())

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

except Exception:  # pragma: no cover
    MetricsListener = None  # type: ignore[assignment]
