"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf0.01, compare row count + column names + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from nuclei_feature_extraction_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rows {len(spark_pdf)} != {len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"cols {sc} != {oc}")
        return problems
    a, b = canon(spark_pdf), canon(oracle_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind in "fc" or bv.dtype.kind in "fc":
                ok = np.allclose(
                    av.astype(float), bv.astype(float), rtol=1e-9, atol=1e-9,
                    equal_nan=True,
                )
                # driver parity: its value-hash is over string reprs, so
                # -0.0 vs 0.0 (or any repr diff) fails there even when
                # allclose passes — enforce the same here
                if ok and not (av.astype(float).astype(str)
                               == bv.astype(float).astype(str)).all():
                    problems.append(
                        f"col {c}: allclose but repr differs (driver "
                        "hash would FAIL — check -0.0 / rounding mode)"
                    )
                    continue
            else:
                ok = (av.astype(str) == bv.astype(str)).all()
            if not ok:
                bad = np.asarray(
                    (av.astype(str) != bv.astype(str))
                    if av.dtype.kind not in "fc"
                    else ~np.isclose(av.astype(float), bv.astype(float), equal_nan=True)
                )
                i = int(np.argmax(bad))
                problems.append(
                    f"col {c}: {bad.sum()} diffs, first at row {i}: "
                    f"{av.iloc[i]!r} vs {bv.iloc[i]!r} "
                    f"(key row: {a.iloc[i].to_dict() if len(a.columns) < 8 else ''})"
                )
    return problems


def main() -> int:
    args = [a for a in sys.argv[1:]]
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    spark = get_spark(app_name="check-oracle")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if only is not None:
        qs = {k: v for k, v in qs.items() if k in only}
    failures = 0
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spdf)} rows)")
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {e}")
            failures += 1
            continue
        problems = compare(name, spdf, opdf)
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(spdf)} rows match")
    print(f"\n{len(qs) - failures}/{len(qs)} queries ok")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
