"""TOPOLOGY PARITY: run the full driver-gate query set on the REAL
spark:// standalone cluster (2 worker JVMs — actual executor processes,
socket shuffle, pickled closures) and hash-compare every result to the
same queries on local[N] (VERDICT r6 ask #1).

local[N] is one JVM with threads: no real serialization boundary, no
cross-process shuffle, one Python-worker pool. Real executors change
partitioning, Arrow batch boundaries and task placement — exactly the
axes a nondeterministic aggregation (float accumulation order, unstable
top-k ties, per-partition ids leaking into output) would show up on.
Every gate query is engineered to be order-independent (integer-exact
or bit-stable formulations); THIS tool is the proof across a process
boundary, not just across thread counts.

Canonical hash: rows are rendered with repr-stable scalar formatting,
sorted (order-independence), then SHA-256'd — the same spirit as the
driver gate's value hash (column-name-sorted, row-order-free).

Usage: python tools/topology_parity.py [--sf-dir /root/testdata/sf0.01]
         [--local-cores 16] [--queries a,b,c] [--out BENCH/topology_parity.json]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.standalone_cluster import (  # noqa: E402
    MASTER_PORT,
    N_WORKERS,
    WORKER_CORES,
    standalone_session,
)


def _canon(v) -> str:
    """Repr-stable scalar rendering (bitwise-faithful for floats via
    repr; recursive for arrays/structs)."""
    import numpy as np

    if v is None:
        return "\x00"
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k}:{_canon(x)}" for k, x in sorted(v.items())
        ) + "}"
    return str(v)


def frame_fingerprint(df) -> dict:
    """(row-order-free value hash, row count, name-sorted schema)."""
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    rows = [
        "\x1f".join(_canon(v) for v in rec)
        for rec in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    h = hashlib.sha256("\x1e".join(rows).encode()).hexdigest()
    return {
        "hash": h,
        "rows": len(pdf),
        "schema": {c: str(df.schema[c].dataType.simpleString()) for c in cols},
    }


def gate_fingerprints(spark, sf_dir: str, names: list[str]) -> dict:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            fp = frame_fingerprint(qs[name](spark, sf_dir))
            fp["wall"] = round(time.perf_counter() - t0, 2)
            out[name] = fp
        except Exception as e:
            out[name] = {"err": f"{type(e).__name__}: {e}"[:500]}
        print(
            f"  {name}: {out[name].get('hash', 'ERR')[:12]} "
            f"rows={out[name].get('rows')} "
            f"({out[name].get('wall', '-')}s)",
            file=sys.stderr,
        )
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--local-cores", type=int, default=16)
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset (default: all)")
    ap.add_argument("--out", default=os.path.join(
        REPO, "BENCH", "topology_parity.json"))
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from nuclei_feature_extraction_spark.session import get_spark

    names = sorted(entrymod.queries())
    if args.queries:
        names = [n for n in args.queries.split(",") if n]

    # ---- phase A: local[N] (the gate's usual topology) --------------
    print(f"phase A: local[{args.local_cores}] over {len(names)} queries",
          file=sys.stderr)
    spark = get_spark(master=f"local[{args.local_cores}]",
                      shuffle_partitions=4 * args.local_cores,
                      app_name="nfx-parity-local")
    local_fp = gate_fingerprints(spark, args.sf_dir, names)
    spark.stop()

    # ---- phase B: real standalone cluster (shared recipe — the bench,
    # this tool and the pytest smoke verify the SAME topology conf) ----
    print(f"phase B: spark:// {N_WORKERS}x{WORKER_CORES}-core workers",
          file=sys.stderr)
    with standalone_session(
        log_dir="/tmp/nfx_parity_logs",
        app_name="nfx-parity-standalone",
        ship_entry=True,  # gate-query closures reference __spark_entry__
    ) as spark:
        sa_fp = gate_fingerprints(spark, args.sf_dir, names)
        # probe AFTER work ran — block managers register lazily
        n_block_managers = (
            spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
        )
        executors = max(n_block_managers - 1, 0)

    # ---- compare -----------------------------------------------------
    per_query, n_match = {}, 0
    for name in names:
        a, b = local_fp.get(name, {}), sa_fp.get(name, {})
        ok = (
            "hash" in a and "hash" in b
            and a["hash"] == b["hash"]
            and a["rows"] == b["rows"]
            and a["schema"] == b["schema"]
        )
        n_match += ok
        per_query[name] = {
            "match": ok,
            "rows": a.get("rows"),
            "local_hash": a.get("hash", a.get("err")),
            "standalone_hash": b.get("hash", b.get("err")),
        }
    result = {
        "mode": "topology_parity",
        "sf_dir": args.sf_dir,
        "local_master": f"local[{args.local_cores}]",
        "standalone_master": f"spark://127.0.0.1:{MASTER_PORT}",
        "workers": N_WORKERS,
        "worker_cores": WORKER_CORES,
        "executors_seen": executors,
        "n_queries": len(names),
        "n_match": n_match,
        "all_match": n_match == len(names),
        "queries": per_query,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "queries"}))
    for name, q in per_query.items():
        if not q["match"]:
            print(f"MISMATCH {name}: local={q['local_hash'][:40]} "
                  f"standalone={q['standalone_hash'][:40]}")
    return 0 if result["all_match"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
