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


def transcript_pipeline(spark: SparkSession, fixture_dir: str, fused: bool = True):
    """The flagship feature job on the synthetic transcript table: the
    full registry — sessionize, lag/rolling/masked/circular/bank window
    features, all three prefix-kernel families, keyed as-of against
    side_user_profile, keyless broadcast as-of against side_model_config.

    Uses the fused single-shuffle plan (plans/fused.py) — verified
    column-identical to the composable Catalyst pipeline by
    tests/test_fused.py; wide rows never cross an exchange."""
    from nuclei_feature_extraction_spark.plans.fused import build_features_fused
    from nuclei_feature_extraction_spark.plans.pipeline import build_features

    tr = spark.read.parquet(os.path.join(fixture_dir, "transcripts.parquet"))
    prof = spark.read.parquet(os.path.join(fixture_dir, "side_user_profile.parquet"))
    cfg = spark.read.parquet(os.path.join(fixture_dir, "side_model_config.parquet"))
    if fused:
        return build_features_fused(tr, side_profile=prof, side_config=cfg)
    return build_features(tr, ["all"], side_profile=prof, side_config=cfg)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from nuclei_feature_extraction_spark.fixtures import fixtures_dir
    from nuclei_feature_extraction_spark.session import get_spark

    fixture_scale = os.environ.get("NFX_BENCH_SCALE", "bench")
    fixture_dir = fixtures_dir(fixture_scale)

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=4 * cpus,
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
        walls = []
        for _ in range(2):  # best-of-2: this VM's 32-thread noise is ±50%
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            walls.append(time.perf_counter() - t0)
        timings[name] = round(min(walls), 3)

    # transcript flagship: the north-rule metric (turns/sec).
    # Warm the plan once (codegen + python worker pool) on a slice, then
    # measure the full pass.
    n_turns = spark.read.parquet(
        os.path.join(fixture_dir, "transcripts.parquet")
    ).count()
    _force(transcript_pipeline(spark, fixture_dir).limit(20_000))
    walls = []
    for _ in range(3):  # best-of-3: host interference windows last minutes
        pipe = transcript_pipeline(spark, fixture_dir)
        t0 = time.perf_counter()
        _force(pipe)
        walls.append(time.perf_counter() - t0)
    dt = min(walls)  # steady-state: VM noise at 32 threads is large
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
