"""Skew handling: heavy-key detection + deterministic salting.

Conversation lengths are Zipf-skewed; a 10^4-turn mega-conversation
pins one task while thousands of tiny ones finish. Remedies, in order:

1. AQE skew-join split (on by default in session.py) — handles JOIN
   skew automatically at runtime.
2. For ASSOCIATIVE per-conversation aggregates: salt the key with a
   turn-block id (``conv#block``), aggregate partially per salted key,
   then merge partials per conversation (two small shuffles instead of
   one skewed one).
3. For ORDER-DEPENDENT kernels (run-lengths, prefix co-occurrence):
   never salt — the per-conversation pandas kernel is O(n) and
   vectorized, and `repartition(conv_id)` spreads distinct
   conversations; a single 20k-turn group is ~ms of numpy.

The salt is deterministic (no rand()) so results are reproducible and
resumable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_HEAVY_THRESHOLD = 10_000
DEFAULT_BLOCK = 2_048


def detect_heavy_keys(
    df: DataFrame,
    key: str = "conv_id",
    threshold_rows: int = DEFAULT_HEAVY_THRESHOLD,
) -> DataFrame:
    """Exact heavy-hitter scan: keys with more rows than the threshold.

    Output is tiny (heavy keys are by definition few) → safe to
    broadcast into the salting join.
    """
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > threshold_rows)
    )


def with_salted_key(
    df: DataFrame,
    key: str = "conv_id",
    order_col: str = "turn_idx",
    block: int = DEFAULT_BLOCK,
    heavy_keys: DataFrame | None = None,
    threshold_rows: int = DEFAULT_HEAVY_THRESHOLD,
    out_col: str = "salted_key",
) -> DataFrame:
    """Append ``salted_key``: ``key#<order_col div block>`` for heavy
    keys, plain ``key`` otherwise.

    Heavy-key membership arrives via a BROADCAST left-semi-style join
    (the heavy set is tiny), so the only full shuffle left is the
    downstream aggregation on the now-balanced salted key.
    """
    if heavy_keys is None:
        heavy_keys = detect_heavy_keys(df, key, threshold_rows)
    marks = F.broadcast(
        heavy_keys.select(F.col(key).alias("__hk"), F.lit(True).alias("__is_heavy"))
    )
    out = df.join(marks, on=df[key] == marks["__hk"], how="left")
    salted = F.when(
        F.col("__is_heavy").isNotNull(),
        F.concat_ws(
            "#", F.col(key), (F.col(order_col) / F.lit(block)).cast("long")
        ),
    ).otherwise(F.col(key))
    return out.withColumn(out_col, salted).drop("__hk", "__is_heavy")


def salted_agg(
    df: DataFrame,
    key: str,
    order_col: str,
    partial_aggs: list[tuple[str, str]],
    block: int = DEFAULT_BLOCK,
    threshold_rows: int = DEFAULT_HEAVY_THRESHOLD,
) -> DataFrame:
    """Two-phase skew-safe aggregation for associative stats.

    ``partial_aggs`` is [(col, fn)] with fn in {sum,count,min,max}.
    Phase 1 aggregates per salted key; phase 2 merges partials per real
    key (sum of sums, min of mins, …). Non-associative stats (mean/std)
    are derived from (sum, count, sum of squares) by the caller.
    """
    mergeable = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for _, fn in partial_aggs:
        if fn not in mergeable:
            raise ValueError(f"{fn} is not associative-mergeable")
    salted = with_salted_key(
        df, key, order_col, block=block, threshold_rows=threshold_rows
    )
    p1 = salted.groupBy("salted_key", key).agg(
        *[
            getattr(F, fn)(c).alias(f"{c}_{fn}")
            for c, fn in partial_aggs
        ]
    )
    return p1.groupBy(key).agg(
        *[
            mergeable[fn](f"{c}_{fn}").alias(f"{c}_{fn}")
            for c, fn in partial_aggs
        ]
    )
