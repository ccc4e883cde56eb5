"""Sources & sinks (reference S1-S11, SURVEY.md §2.1).

- ``read_transcripts``: schema-enforced scan (serde-struct analog,
  /root/reference/src/geojson.rs:8-24 + main.rs:37-42) — FAILFAST on
  corrupt rows for json/csv, explicit StructType everywhere (never
  inferSchema in the engine path).
- ``write_features``: extension-dispatched sink with an overwrite guard
  (main.rs:164-189, args.rs:147-166): csv / parquet|pqt / json; Arrow
  IPC (S10) needs no sink — Arrow is the engine's UDF wire format.
- Iceberg is the design-point catalog (bucket(conv_id) + days(ts)
  partitioning); the runtime jar is absent in this sandbox, so
  ``write_iceberg_style`` emulates the layout with hash-bucketed
  parquet partitions + a manifest (see checkpoint.py for snapshots).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

_SINKS = {".csv": "csv", ".parquet": "parquet", ".pqt": "parquet", ".json": "json"}


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Typed transcript scan. Parquet carries its own schema (verified
    compatible); json/csv get the explicit schema + FAILFAST (the serde
    ``unwrap`` analog: corrupt input is an analysis-time error, not a
    silent drop)."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".parquet", ".pqt") or os.path.isdir(path):
        df = spark.read.parquet(path)
        missing = [f.name for f in TRANSCRIPT_SCHEMA if f.name not in df.columns]
        if missing:
            raise ValueError(f"transcript table missing columns {missing}")
        return df.select([f.name for f in TRANSCRIPT_SCHEMA])
    if ext == ".json":
        return spark.read.schema(TRANSCRIPT_SCHEMA).option(
            "mode", "FAILFAST"
        ).json(path)
    if ext == ".csv":
        return spark.read.schema(TRANSCRIPT_SCHEMA).option(
            "mode", "FAILFAST"
        ).option("header", "true").csv(path)
    raise ValueError(f"unsupported transcript source extension {ext!r}")


def write_features(
    df: DataFrame, path: str, overwrite: bool = False, partition_by: list[str] | None = None
) -> None:
    """Extension-dispatched sink; refuses to clobber without
    ``overwrite=True`` (reference --overwrite guard, args.rs:147-166)."""
    ext = os.path.splitext(path)[1].lower()
    fmt = _SINKS.get(ext)
    if fmt is None:
        raise ValueError(
            f"unsupported sink extension {ext!r}; known: {sorted(_SINKS)}"
        )
    writer = df.write.format(fmt).mode("overwrite" if overwrite else "errorifexists")
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_iceberg_style(
    df: DataFrame,
    path: str,
    n_buckets: int = 64,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    overwrite: bool = False,
) -> None:
    """Iceberg-layout emulation: ``bucket(conv_id)`` × ``days(ts)``
    partitioned parquet. On a real cluster this is
    ``df.writeTo(tbl).partitionedBy(bucket(N, conv_id), days(ts))`` —
    swap in when the Iceberg runtime is on the classpath."""
    out = df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
    ).withColumn("dt", F.to_date(ts_col))
    out.write.mode("overwrite" if overwrite else "errorifexists").partitionBy(
        "bucket", "dt"
    ).parquet(path)
