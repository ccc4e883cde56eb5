"""Per-round benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries", "sf",
plus throughput extras}.

Each query is forced end-to-end with the noop sink (full computation,
no driver collect). The transcript feature pipeline additionally
reports turns/sec — the BASELINE.json north metric.

SAME-WINDOW CONTROL (VERDICT r6 ask #7): this box's VM noise swings
wall times ±50% between windows, which made every round's driver
artifact need judge re-adjudication. When a control ref is available
(``--control <git-ref>`` or the repo-root ``.bench_control`` file), the
harness interleaves FULL bench passes of HEAD and the control ref
(checked out into a throwaway git worktree) inside one window —
H, C, H, C — takes the best pass per variant, and emits the control
row + ratio in the same JSON line. ``--plain`` (used for the inner
passes) runs the classic single-process bench.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402


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


def run_bench() -> dict:
    """One full in-process bench pass → the classic result dict."""
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
    return {
        "metric": "total headline wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "turns_per_sec": turns_per_sec,
        "transcript_rows": n_turns,
        "cpus": cpus,
    }


# ------------------------------------------------ same-window control

def _control_ref() -> str | None:
    """Control ref resolution: an explicit `.bench_control` file wins;
    otherwise auto-detect the PREVIOUS ROUND's boundary commit (the
    driver commits each round as 'round N: verdict/...'), so the
    control baseline self-maintains across rounds without anyone
    remembering to bump a pinned sha."""
    path = os.path.join(REPO, ".bench_control")
    if os.path.exists(path):
        ref = open(path).read().strip()
        if ref:
            return ref
    def _git(*args):
        out = subprocess.run(["git", "-C", REPO, *args],
                             capture_output=True, text=True, timeout=30)
        return out.stdout.strip()

    try:
        ref = _git("log", "--grep", r"^round [0-9]*:", "-1", "--format=%H")
        if ref and ref == _git("rev-parse", "HEAD"):
            # benching AT a round-boundary commit: HEAD itself matches
            # the grep, and a control equal to HEAD would burn passes
            # comparing identical code — walk past it
            ref = _git("log", "--grep", r"^round [0-9]*:", "-1",
                       "--format=%H", "HEAD~1")
        return ref or None
    except Exception:
        return None


def _subprocess_pass(cwd: str) -> dict | None:
    """One full bench pass in a child process (fresh JVM — exactly what
    the driver measures). Returns the parsed JSON line or None."""
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(cwd, "bench.py"), "--plain"],
            capture_output=True, text=True, cwd=cwd, timeout=1800,
            env=dict(os.environ),
        )
        for line in reversed(out.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    except Exception as e:  # control must never sink the head artifact
        print(f"control pass failed: {e!r}", file=sys.stderr)
    return None


def _with_control(ref: str, passes: int = 2) -> dict:
    """Interleave HEAD and control-ref bench passes (H, C, H, C) inside
    one noise window; best pass per variant. The control tree runs its
    OWN bench.py/__spark_entry__/package from a throwaway worktree; the
    fixture cache is symlinked so the control doesn't regenerate it."""
    wt = f"/tmp/nfx_bench_control_{os.getpid()}"
    subprocess.run(["git", "-C", REPO, "worktree", "add", "--detach",
                    "--force", wt, ref], check=True, capture_output=True)
    try:
        cache_src = os.path.join(REPO, ".cache")
        cache_dst = os.path.join(wt, ".cache")
        if os.path.isdir(cache_src) and not os.path.exists(cache_dst):
            os.symlink(cache_src, cache_dst)
        head_runs, ctrl_runs = [], []
        for _ in range(passes):
            h = _subprocess_pass(REPO)
            if h:
                head_runs.append(h)
            c = _subprocess_pass(wt)
            if c:
                ctrl_runs.append(c)
        if not head_runs:  # subprocess path broken — fall back in-process
            return run_bench()
        best = min(head_runs, key=lambda r: r["value"])
        if ctrl_runs:
            # a malformed control line (older bench schema, zero walls)
            # must never sink the head artifact after the passes ran
            try:
                cbest = min(ctrl_runs, key=lambda r: r["value"])
                ctrl_flagship = cbest["queries"]["transcript_pipeline"]
                best["control"] = {
                    "ref": ref,
                    "value": cbest["value"],
                    "turns_per_sec": cbest.get("turns_per_sec"),
                    "queries": cbest.get("queries"),
                    "ratio_total": round(best["value"] / cbest["value"], 3),
                    "ratio_flagship": round(
                        best["queries"]["transcript_pipeline"]
                        / ctrl_flagship, 3,
                    ),
                    "passes_per_variant": passes,
                    "interleave": "H,C," * passes,
                }
            except Exception as e:
                best["control"] = {"ref": ref,
                                   "error": f"{type(e).__name__}: {e}"}
        return best
    finally:
        subprocess.run(["git", "-C", REPO, "worktree", "remove", "--force",
                        wt], capture_output=True)


def main() -> None:
    argv = sys.argv[1:]
    if "--plain" in argv:
        print(json.dumps(run_bench()))
        return
    ref = None
    if "--control" in argv:
        i = argv.index("--control")
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            print("usage: bench.py [--plain | --control <git-ref>]",
                  file=sys.stderr)
            raise SystemExit(2)
        ref = argv[i + 1]
    else:
        ref = _control_ref()
    if ref:
        ok = subprocess.run(["git", "-C", REPO, "rev-parse", "--verify",
                             f"{ref}^{{commit}}"], capture_output=True)
        if ok.returncode != 0:
            ref = None  # e.g. shallow clone without the control commit
    if ref is None:
        print(json.dumps(run_bench()))
        return
    print(json.dumps(_with_control(ref)))


if __name__ == "__main__":
    main()
