"""Full-width flagship bench: the fused pipeline at the COMPLETE
reference-class feature grid (texture.rs:19-20: GLCM d ∈ {1,2,3,5} ×
K ∈ {4,8,16,32} → 224 co-occurrence columns, + 72 run-length + 40
cross-signal + 11 shape + 46 window/Gabor ≈ 400+ columns per turn —
the width class of the reference's 418-column output) on the bench
fixture, at two parallelism levels.

Same protocol as tools/scaling_bench.py: fresh JVM per level, warmup
pass excluded, best of N measured passes. Writes
BENCH/fullwidth_latest.md and prints one JSON line.

Usage: python tools/fullwidth_bench.py [--scale bench] [--passes 3]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FULL_LAGS = (1, 2, 3, 5)
FULL_LEVELS = (4, 8, 16, 32)

RUNNER = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
from nuclei_feature_extraction_spark.session import get_spark
from nuclei_feature_extraction_spark.fixtures import fixtures_dir
from nuclei_feature_extraction_spark.plans.fused import build_features_fused
from bench import _force
import os

cpus = int(sys.argv[1]); scale = sys.argv[2]; passes = int(sys.argv[3])
spark = get_spark(master=f"local[{{cpus}}]", shuffle_partitions=4 * cpus,
                  app_name=f"nfx-fullwidth-{{cpus}}")
d = fixtures_dir(scale)
tr = spark.read.parquet(f"{{d}}/transcripts.parquet")
prof = spark.read.parquet(f"{{d}}/side_user_profile.parquet")
cfg = spark.read.parquet(f"{{d}}/side_model_config.parquet")
n = tr.count()

def job():
    return build_features_fused(
        tr, side_profile=prof, side_config=cfg,
        lags={lags!r}, levels={levels!r},
    )

ncols = len(job().columns)
_force(job().limit(20_000))  # warmup: codegen + Arrow worker pool
times = []
for _ in range(passes):
    t0 = time.perf_counter()
    _force(job())
    times.append(time.perf_counter() - t0)
best = min(times)
print(json.dumps({{"cpus": cpus, "rows": n, "n_cols": ncols,
                   "wall_all": [round(t,1) for t in times],
                   "wall": round(best, 2),
                   "turns_per_sec": round(n / best, 1)}}))
"""


def run_level(cpus: int, scale: str, passes: int, retries: int = 1) -> dict:
    code = RUNNER.format(repo=REPO, lags=FULL_LAGS, levels=FULL_LEVELS)
    last_err = ""
    for _ in range(retries + 1):
        out = subprocess.run(
            [sys.executable, "-c", code, str(cpus), scale, str(passes)],
            capture_output=True, text=True, timeout=6000, cwd=REPO,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)
        last_err = out.stderr[-2000:]
    raise RuntimeError(f"no result for local[{cpus}]: {last_err}")


def main() -> None:
    argv = sys.argv[1:]
    scale = argv[argv.index("--scale") + 1] if "--scale" in argv else "bench"
    passes = int(argv[argv.index("--passes") + 1]) if "--passes" in argv else 3
    lo = run_level(8, scale, passes)
    hi = run_level(32, scale, passes)
    eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / 4.0
    result = {
        "scale": scale,
        "rows": lo["rows"],
        "n_cols": lo["n_cols"],
        "local8": lo,
        "local32": hi,
        "scaling_efficiency_8_to_32": round(eff, 3),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "fullwidth_latest.md"), "w") as fh:
        fh.write(
            f"# full-width flagship run ({scale}, {lo['rows']:,} rows, "
            f"{lo['n_cols']} output columns)\n\n"
            "| parallelism | wall s (best) | turns/s |\n|---|---|---|\n"
            f"| local[8] | {lo['wall']} | {lo['turns_per_sec']:,} |\n"
            f"| local[32] | {hi['wall']} | {hi['turns_per_sec']:,} |\n\n"
            f"efficiency 8→32: {round(eff,3)}\n"
            f"walls: local8={lo['wall_all']}, local32={hi['wall_all']}\n"
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
