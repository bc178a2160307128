"""Windowed streaming aggregation over event streams.

The reference has no streaming surface; this is the Structured
Streaming shape a crawl/ingest pipeline needs: event-time tumbling
windows with a watermark for late data. The same expression tree runs
in batch mode (tested for stream==batch equivalence)."""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


def windowed_event_counts(
    df: "DataFrame",
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    streaming: bool = False,
    exact_sums: bool = False,
) -> "DataFrame":
    """Tumbling-window counts + value sums per key. With
    ``streaming=True`` a watermark bounds state for late data;
    ``exact_sums`` sums in decimal (fold-order-independent, used by the
    cross-engine oracle gate)."""
    from pyspark.sql import functions as F

    if streaming:
        # watermarks require TIMESTAMP (parquet event time is NTZ)
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    val = (
        F.sum(F.col("value").cast("decimal(28,10)")).cast("double")
        if exact_sums
        else F.sum("value")
    )
    return (
        df.groupBy(
            F.window(ts_col, window).alias("w"),
            F.col(key_col).alias("event_type"),
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            val.alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
