"""Per-round benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries", "sf",
plus throughput extras}.

Each query is forced end-to-end with the noop sink (full computation,
no driver collect). The transcript feature pipeline additionally
reports turns/sec — the BASELINE.json north metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def transcript_pipeline(spark: SparkSession, fixture_dir: str):
    """The flagship feature job on the synthetic transcript table:
    sessionize + lag/rolling/circular window features + keyed as-of
    against side_user_profile + keyless broadcast as-of against
    side_model_config."""
    from pyspark.sql import functions as F

    from nuclei_feature_extraction_spark.functions.timeutil import epoch_seconds
    from nuclei_feature_extraction_spark.operators import (
        asof_join,
        asof_join_broadcast,
        sessionize,
        with_lag_lead,
        with_masked_rolling,
        with_rolling,
    )
    from nuclei_feature_extraction_spark.operators.windows import (
        multi_scale_rolling_bank,
        with_circular_time_mean,
    )

    tr = spark.read.parquet(os.path.join(fixture_dir, "transcripts.parquet"))
    prof = spark.read.parquet(os.path.join(fixture_dir, "side_user_profile.parquet"))
    cfg = spark.read.parquet(os.path.join(fixture_dir, "side_model_config.parquet"))

    df = tr.withColumn("tlen", F.length("text").cast("double"))
    df = sessionize(df)
    df = with_lag_lead(df, ["tlen", "role"], lags=(1, 2, 3))
    df = with_rolling(df, "tlen", stats=("mean", "std", "min", "max"), rows=20)
    df = with_masked_rolling(
        df, "tlen", F.col("role") == "assistant", "asst", rows=20
    )
    df = with_circular_time_mean(df, rows=20)
    df = multi_scale_rolling_bank(df, "tlen", windows=(4, 16, 64), stats=("mean", "std"))
    df = asof_join(df, prof, on="conv_id", tie_cols=("plan",))
    df = asof_join_broadcast(df, cfg)
    return df


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from nuclei_feature_extraction_spark.fixtures import fixtures_dir
    from nuclei_feature_extraction_spark.session import get_spark

    fixture_scale = os.environ.get("NFX_BENCH_SCALE", "bench")
    fixture_dir = fixtures_dir(fixture_scale)

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                      app_name="nfx-bench")

    import __spark_entry__ as entrymod

    headline = [
        "sessionize",
        "rolling",
        "session_stats",
        "asof_error",
        "run_length_stats",
        "dedup_exact",
        "minhash_pairs",
        "cosine_topk",
    ]
    qs = entrymod.queries()
    timings: dict[str, float] = {}

    # warm the JVM/Arrow paths once so timings measure steady state
    _force(qs["sessionize"](spark, sf_dir).limit(1000))

    for name in headline:
        t0 = time.perf_counter()
        _force(qs[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    # transcript flagship: the north-rule metric (turns/sec)
    pipe = transcript_pipeline(spark, fixture_dir)
    n_turns = spark.read.parquet(
        os.path.join(fixture_dir, "transcripts.parquet")
    ).count()
    t0 = time.perf_counter()
    _force(pipe)
    dt = time.perf_counter() - t0
    timings["transcript_pipeline"] = round(dt, 3)
    turns_per_sec = round(n_turns / dt, 1)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total headline wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "turns_per_sec": turns_per_sec,
                "transcript_rows": n_turns,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
