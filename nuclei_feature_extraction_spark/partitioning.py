"""Scale-adaptive input fan-out (optimization guide §2.5, "input skew").

A narrow (shuffle-free) pipeline inherits the scan's partitioning. One
unsplittable input file — a single parquet row group, a gzip — caps the
whole pipeline at ONE task, so a 32-core executor computes signatures /
shingles / dot products on one core while 31 idle. The guide's fix is
"repartition immediately after the read"; this helper applies it only
when it can help:

- input partitions >= the session's parallelism → NO-OP (the 100 TB
  case: thousands of input splits; adding a payload shuffle there would
  be pure waste);
- fewer partitions than cores → round-robin ``repartition(target)``
  (deterministic under retry: sort-before-repartition is on by default,
  SPARK-23207), paying one bounded shuffle of the payload to unlock
  full-width compute for the expensive narrow stage that follows.

Use ONLY in front of per-row compute heavy enough to dominate the
shuffle it buys (MinHash/SimHash signatures, shingle construction,
vector scoring) — not as a blanket scan wrapper.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# Floor on the slice each fanned-out task would get (optimizer plan
# estimate, i.e. compressed file bytes for a scan). Below it, the
# repartition's shuffle + task wave costs more than the lone-task
# compute it parallelizes (measured A/B on the 5k-doc bench table:
# fan-out was ~5% slower there, ~17% faster at 50k docs). Env-tunable
# for clusters whose per-task overheads differ.
MIN_BYTES_PER_TASK = int(
    os.environ.get("NFX_FANOUT_MIN_BYTES_PER_TASK", 64 * 1024)
)


def ensure_min_partitions(
    df: DataFrame,
    target: int | None = None,
    min_bytes_per_task: int | None = None,
) -> DataFrame:
    """Round-robin repartition ``df`` up to ``target`` partitions (default:
    the executor CORE count) when — and only when — its plan currently
    yields fewer. Row content is unchanged; only placement.

    The target is deliberately the core count, NOT
    ``spark.default.parallelism`` (sessions set that to 4× cores for
    shuffle-partition headroom): this fan-out exists to keep cores busy
    through one compute-heavy narrow stage, and over-splitting a small
    frame into 4× more tasks than cores just adds scheduling latency to
    every downstream job that reads it."""
    spark = df.sparkSession
    if target is None:
        sc = spark.sparkContext
        try:
            target = sc._jsc.sc().maxNumConcurrentTasks(
                sc._jsc.sc().resourceProfileManager().defaultResourceProfile()
            )
        except Exception:
            target = sc.defaultParallelism
        target = max(int(target), 1)
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # un-materializable plan (e.g. streaming) — leave it
        return df
    if n >= target:
        return df
    if min_bytes_per_task is None:
        min_bytes_per_task = MIN_BYTES_PER_TASK
    try:
        est = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        if est // target < min_bytes_per_task:
            return df
    except Exception:
        pass  # no estimate → fan out anyway (the conservative direction)
    return df.repartition(target)
