"""Streaming exact deduplication — the incremental path of the
training-data pipeline's most important operator (batch twin:
``operators.dedup.exact_dedup``).

A live document feed is deduplicated on the SAME 192-bit composite text
identity the batch operator uses (two independent xxhash64 streams +
byte length — ``operators.dedup._text_key``), via Structured Streaming's
stateful ``dropDuplicates``: the first arrival of each fingerprint
passes through, later copies are dropped in any micro-batch slicing.

State is BOUNDED by the event-time watermark: a fingerprint older than
the watermark horizon is evicted, so state size is
O(unique docs per horizon), not O(stream length) — the standard
exactly-within-horizon streaming dedup contract (duplicates farther
apart than the horizon re-admit; pick the horizon per pipeline SLA, or
pass ``watermark=None`` for exact-forever dedup with unbounded state on
bounded replays).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from nuclei_feature_extraction_spark.operators.dedup import _text_key


def streaming_dedup_exact(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """First-arrival-wins exact dedup over a streaming DataFrame.

    Returns the input rows minus later duplicates (fingerprint columns
    are internal). With a watermark, uses
    ``dropDuplicatesWithinWatermark`` so the dedup state is evicted at
    the horizon; without one, plain ``dropDuplicates`` (exact over the
    whole stream, unbounded state — bounded-replay / test use)."""
    from pyspark.sql import functions as F

    keyed = stream_df.select("*", *_text_key(text_col))
    fp_cols = ["__th1", "__th2", "__tl"]
    if watermark is not None:
        # watermarks require TIMESTAMP (ltz); parquet feeds written by
        # pandas/arrow arrive as TIMESTAMP_NTZ — run the watermark on an
        # internal cast so the caller's column type passes through
        keyed = keyed.withColumn("__evt", F.col(ts_col).cast("timestamp"))
        out = (
            keyed.withWatermark("__evt", watermark)
            .dropDuplicatesWithinWatermark(fp_cols)
            .drop("__evt")
        )
    else:
        out = keyed.dropDuplicates(fp_cols)
    return out.drop(*fp_cols)
