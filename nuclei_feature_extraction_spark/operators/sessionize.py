"""Gap-based sessionization (30-min inactivity cutoff).

Standard two-window idiom: ``new_session = (ts - lag(ts) > gap)``,
``session_id = sum(new_session) over (partitionBy conv orderBy ts)``.
Boundary semantics pinned by test: a gap strictly greater than the
cutoff splits; an exactly-equal gap does NOT.

This is the engine's partition-shaping primitive — the analog of the
reference's per-slide process partitioning (/root/reference/run.sh:43-55)
and its bbox window pre-filter (/root/reference/src/filter_geojson.rs:29-44),
re-expressed as a keyed, ordered Window computation that Catalyst executes
with a single shuffle on ``conv_id``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nuclei_feature_extraction_spark.functions.timeutil import epoch_seconds

DEFAULT_GAP_MINUTES = 30.0


def session_boundary_col(
    ts_col: str = "ts",
    conv_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("ts", "turn_idx"),
    gap_minutes: float = DEFAULT_GAP_MINUTES,
) -> Column:
    w = Window.partitionBy(conv_col).orderBy(*order_cols)
    prev_ts = F.lag(ts_col).over(w)
    gap_s = epoch_seconds(ts_col) - epoch_seconds(prev_ts)
    return (
        F.when(prev_ts.isNull(), F.lit(0))
        .when(gap_s > gap_minutes * 60.0, F.lit(1))
        .otherwise(F.lit(0))
    )


def sessionize(
    df: DataFrame,
    gap_minutes: float = DEFAULT_GAP_MINUTES,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("ts", "turn_idx"),
    out_col: str = "session_id",
) -> DataFrame:
    """Append an int ``session_id`` (0-based, per conversation).

    Both windows share one partitioning/ordering, so the physical plan
    is a single sort + single Window node — no extra shuffle.
    """
    w = (
        Window.partitionBy(conv_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    boundary = session_boundary_col(ts_col, conv_col, order_cols, gap_minutes)
    return df.withColumn(
        out_col, F.sum(boundary).over(w).cast("int")
    )
