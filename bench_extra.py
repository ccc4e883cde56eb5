"""Extra benchmarks for the optimization rounds (guide §1.4): per-query
noop-sink isolation, plan capture, and phase breakdowns.

``bench.py`` is FROZEN for driver measurement — everything exploratory
lives here.

Usage:
    python bench_extra.py [--sf-dir DIR] [--queries a,b,c] [--repeat N]
        [--plans-dir plans/r08] [--tag before|after] [--flagship]

Prints one JSON line with per-query best-of-N wall seconds (noop sink)
and, with --plans-dir, writes ``<plans-dir>/<query>_<tag>.txt`` with the
``explain('formatted')`` output of each timed query.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    argv = sys.argv[1:]

    def _opt(name, default=None):
        if name in argv:
            i = argv.index(name)
            if i + 1 >= len(argv):
                raise SystemExit(f"usage: {name} requires a value")
            return argv[i + 1]
        return default

    sf_dir = _opt("--sf-dir", os.environ.get("SPARK_GRAFT_SF_DIR",
                                             "/root/testdata/sf0.1"))
    repeat = int(_opt("--repeat", "3"))
    plans_dir = _opt("--plans-dir")
    tag = _opt("--tag", "before")
    only = _opt("--queries")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))

    from nuclei_feature_extraction_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=4 * cpus,
                      app_name="nfx-bench-extra")

    import __spark_entry__ as entrymod

    headline = [
        "sessionize", "rolling", "session_stats", "asof_error",
        "run_length_stats", "dedup_exact", "minhash_pairs", "cosine_topk",
    ]
    if only:
        headline = only.split(",")
    qs = entrymod.queries()

    # warm the JVM / python worker pool exactly like bench.py does
    _force(qs["sessionize"](spark, sf_dir).limit(1000))

    timings: dict[str, float] = {}
    for name in headline:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = qs[name](spark, sf_dir)
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        walls = []
        for _ in range(repeat):
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            walls.append(time.perf_counter() - t0)
        timings[name] = round(min(walls), 3)
        spark.sparkContext.setJobDescription(None)

    if "--flagship" in argv:
        import bench as benchmod
        from nuclei_feature_extraction_spark.fixtures import fixtures_dir

        fixture_dir = fixtures_dir(os.environ.get("NFX_BENCH_SCALE", "bench"))
        spark.sparkContext.setJobDescription("bench_extra: transcript_pipeline")
        if plans_dir:
            df = benchmod.transcript_pipeline(spark, fixture_dir)
            with open(os.path.join(plans_dir,
                                   f"transcript_pipeline_{tag}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        _force(benchmod.transcript_pipeline(spark, fixture_dir).limit(20_000))
        walls = []
        for _ in range(repeat):
            pipe = benchmod.transcript_pipeline(spark, fixture_dir)
            t0 = time.perf_counter()
            _force(pipe)
            walls.append(time.perf_counter() - t0)
        timings["transcript_pipeline"] = round(min(walls), 3)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "repeat": repeat,
                      "queries": timings,
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
