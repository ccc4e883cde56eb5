"""Scaling-efficiency evidence (BASELINE.json north rule: ≥0.8 from N
to 4N parallelism; no real cluster in this sandbox, so the same job runs
at two parallelism levels on identical input — per driver instruction).

INTERLEAVED protocol (VERDICT r5 ask #2): this box's wall-clock noise
spans ±50% between windows minutes apart, so composing a ratio from
levels measured in different windows is meaningless. The levels
alternate WITHIN one session — 2,8,2,8,… — so both sample the same box
state; the ratio pairs best-with-best across the interleaved passes.
Each level runs in a fresh process (one JVM each): warmup pass (codegen
+ python worker pool + page cache), then two measured passes.

Writes BENCH/scaling_latest.md (BENCH/BASELINE.md holds the curated
analysis) and prints one JSON line.

Usage:
    python tools/scaling_bench.py [--scale bench] [--rounds 2]
        [--levels 2 8] [--with-32]
    python tools/scaling_bench.py --mode standalone [--scale bench]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
from nuclei_feature_extraction_spark.session import get_spark
from nuclei_feature_extraction_spark.fixtures import fixtures_dir
from bench import transcript_pipeline, _force

cpus = int(sys.argv[1]); scale = sys.argv[2]; npasses = int(sys.argv[3])
master = sys.argv[4] if len(sys.argv) > 4 else f"local[{{cpus}}]"
spark = get_spark(master=master, shuffle_partitions=4 * cpus,
                  app_name=f"nfx-scaling-{{cpus}}")
d = fixtures_dir(scale)
n = spark.read.parquet(f"{{d}}/transcripts.parquet").count()
_force(transcript_pipeline(spark, d).limit(20_000))  # warmup
times = []
for _ in range(npasses):
    t0 = time.perf_counter()
    _force(transcript_pipeline(spark, d))
    times.append(time.perf_counter() - t0)
best = min(times)
print(json.dumps({{"cpus": cpus, "rows": n, "master": master,
                   "wall_all": [round(t,1) for t in times],
                   "wall": round(best, 2), "turns_per_sec": round(n / best, 1)}}))
"""


def run_level(
    cpus: int, scale: str, npasses: int = 2, master: str | None = None,
    retries: int = 1, extra_env: dict | None = None,
) -> dict:
    code = RUNNER.format(repo=REPO)
    argv = [sys.executable, "-c", code, str(cpus), scale, str(npasses)]
    if master:
        argv.append(master)
    env = dict(os.environ, **(extra_env or {}))
    last_err = ""
    for _ in range(retries + 1):
        out = subprocess.run(
            argv, capture_output=True, text=True, timeout=3000, cwd=REPO,
            env=env,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)
        # shared-VM flakiness: a python worker occasionally dies with
        # "Connection reset" under 32-thread contention (seen on both
        # r2 and r3 code the same day) — one retry, then give up loudly
        last_err = out.stderr[-2000:]
    raise RuntimeError(f"no result for local[{cpus}]: {last_err}")


def interleaved(scale: str, levels: list[int], rounds: int,
                with_32: bool) -> dict:
    seq = levels * rounds
    passes = []
    for i, c in enumerate(seq):
        r = run_level(c, scale)
        r["pass"] = i
        passes.append(r)
        print(json.dumps(r), file=sys.stderr)
    if with_32:
        r = run_level(32, scale)
        r["pass"] = len(seq)
        passes.append(r)
        print(json.dumps(r), file=sys.stderr)
    best = {}
    for r in passes:
        c = r["cpus"]
        if c not in best or r["turns_per_sec"] > best[c]["turns_per_sec"]:
            best[c] = r
    lo, hi = min(levels), max(levels)
    eff = (best[hi]["turns_per_sec"] / best[lo]["turns_per_sec"]) / (hi / lo)
    result = {
        "scale": scale,
        "protocol": f"interleaved x{rounds}",
        "rows": best[lo]["rows"],
        "best": {f"local{c}": b for c, b in sorted(best.items())},
        "passes": [
            {"pass": r["pass"], "cpus": r["cpus"], "wall": r["wall"],
             "wall_all": r["wall_all"]}
            for r in passes
        ],
        f"scaling_efficiency_{lo}_to_{hi}": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    if 32 in best and 8 in best:
        e32 = (best[32]["turns_per_sec"] / best[8]["turns_per_sec"]) / 4.0
        result["scaling_efficiency_8_to_32"] = round(e32, 3)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_latest.md"), "w") as fh:
        fh.write(
            f"# scaling run ({scale}, {result['rows']:,} rows, "
            f"interleaved {'/'.join(map(str, levels))} x{rounds})\n\n"
            "| pass | parallelism | wall s (best in pass) | all walls |\n"
            "|---|---|---|---|\n"
        )
        for r in passes:
            fh.write(
                f"| {r['pass']} | local[{r['cpus']}] | {r['wall']} | "
                f"{r['wall_all']} |\n"
            )
        fh.write(
            f"\nbest-of: "
            + ", ".join(
                f"local[{c}] {b['wall']}s ({b['turns_per_sec']:,}/s)"
                for c, b in sorted(best.items())
            )
            + f"\n\nefficiency {lo}→{hi}: {round(eff, 3)} (target ≥0.8)"
            + (
                f"; 8→32: {result['scaling_efficiency_8_to_32']} "
                "(single-box memory ceiling — see BASELINE.md)"
                if "scaling_efficiency_8_to_32" in result else ""
            )
            + "\n"
        )
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="bench")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--levels", type=int, nargs="+", default=[2, 8])
    ap.add_argument("--with-32", action="store_true")
    ap.add_argument("--mode", choices=["local", "standalone"],
                    default="local")
    args = ap.parse_args()
    if args.mode == "standalone":
        from tools.standalone_cluster import standalone_bench

        result = standalone_bench(args.scale)
    else:
        result = interleaved(
            args.scale, args.levels, args.rounds, args.with_32
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
