"""Structured Streaming variant of sessionization (SURVEY.md §2.7 —
optional; the reference is a bounded batch job, this is the incremental
path for live transcript feeds).

``session_window(ts, gap)`` reproduces the batch 30-min-gap semantics
incrementally; the watermark bounds state for late turns. Batch vs
streaming agreement is pinned by test on the tiny fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_session_stats(
    stream: DataFrame,
    gap_seconds: float = 1800.0,
    watermark: str = "2 hours",
    conv_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-(conversation, session) aggregates over a streaming source:
    n_turns, session start/end. Append-mode compatible (sessions emit
    once the watermark passes their close).

    Boundary parity with batch ``sessionize``: the batch operator splits
    only on gap STRICTLY GREATER than the cutoff. ``session_window``'s
    merge condition was verified EMPIRICALLY (Spark 4.1): a gap of
    exactly the duration MERGES and duration+1µs splits — i.e. merge ⇔
    gap ≤ duration, identical to batch. So the duration is passed
    verbatim. Pinned by the exact-boundary case in
    tests/test_checkpoint_lineage_io.py (would catch an engine-version
    semantics change)."""
    gap_us = int(round(gap_seconds * 1_000_000))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_us} microseconds").alias("sw"),
            F.col(conv_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min(ts_col).alias("first_turn_ts"),
            F.max(ts_col).alias("last_turn_ts"),
        )
        .select(
            conv_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_turns",
            "first_turn_ts",
            "last_turn_ts",
        )
    )
