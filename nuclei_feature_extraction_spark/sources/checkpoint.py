"""Checkpoint/resume for long feature backfills (SURVEY.md §4.4).

The reference's resumability is per-slide process isolation
(/root/reference/run.sh:43-55: a failed slide doesn't kill the batch,
rerunning skips nothing). Here the unit of recovery is a HASH BUCKET of
conversations:

- work is split into ``n_buckets`` by ``pmod(xxhash64(conv_id), n)`` —
  deterministic, so a resumed run recomputes the same membership;
- buckets are written in groups (one Spark job per group, pruned by a
  pushed-down bucket filter);
- a manifest (``_manifest.json``, written atomically via rename) records
  completed buckets + per-bucket row counts, wall time and the manifest
  version at which each bucket became visible — the Iceberg-snapshot
  emulation (snapshot id ≈ manifest version), including TIME-TRAVEL
  reads (``read_snapshot``) and a snapshot-history listing
  (``snapshots``), sound because committed buckets are append-only;
- ``run()`` after a crash skips completed buckets (anti-join by bucket
  id at the partition-pruning level, not row level).

Idempotent resume: bucket groups are written with DYNAMIC PARTITION
OVERWRITE (``partitionOverwriteMode=dynamic``), so a crash in the
window between the parquet job committing and the manifest bump (driver
kill, OOM, partial commit) is safe — the resumed run REPLACES those
bucket partitions instead of appending a second copy. Pinned by
``fail_after_write`` injection in tests/test_checkpoint_lineage_io.py.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CheckpointedWriter:
    def __init__(
        self,
        out_dir: str,
        n_buckets: int = 16,
        buckets_per_job: int = 4,
        key_col: str = "conv_id",
    ) -> None:
        self.out_dir = out_dir
        self.n_buckets = n_buckets
        self.buckets_per_job = buckets_per_job
        self.key_col = key_col
        self.manifest_path = os.path.join(out_dir, "_manifest.json")

    @classmethod
    def open_table(cls, out_dir: str) -> "CheckpointedWriter":
        """Open an EXISTING checkpointed table for reading (snapshots /
        time travel), taking ``n_buckets`` from its manifest instead of
        requiring the caller to know the writer's configuration."""
        mpath = os.path.join(out_dir, "_manifest.json")
        if not os.path.exists(mpath):
            raise FileNotFoundError(
                f"not a checkpointed table (no manifest): {mpath}"
            )
        with open(mpath) as fh:
            manifest = json.load(fh)
        return cls(out_dir, n_buckets=int(manifest["n_buckets"]))

    # ---------------------------------------------------------- manifest

    def load_manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as fh:
                return json.load(fh)
        return {"version": 0, "n_buckets": self.n_buckets, "completed": {}}

    def _save_manifest(self, manifest: dict) -> None:
        os.makedirs(self.out_dir, exist_ok=True)
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=2)
        os.replace(tmp, self.manifest_path)  # atomic snapshot bump

    def completed_buckets(self) -> set[int]:
        return {int(b) for b in self.load_manifest()["completed"]}

    def record_run_info(self, info: dict) -> None:
        """Merge job-level routing/telemetry (e.g. the sampled as-of
        strategy decision) into the manifest so every resumable run
        carries the evidence for its physical-plan choices."""
        manifest = self.load_manifest()
        self._check_manifest(manifest)
        manifest.setdefault("run_info", {}).update(info)
        manifest["version"] += 1
        self._save_manifest(manifest)

    # --------------------------------------------------------------- run

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.col(self.key_col)), F.lit(self.n_buckets)).cast(
                "int"
            ),
        )

    def _write_group(self, part: DataFrame) -> None:
        """Idempotent bucket-group write: dynamic partition overwrite
        replaces exactly the bucket partitions present in ``part``, so
        re-running a group after a crash-before-manifest never
        duplicates rows (append would)."""
        part.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("bucket").parquet(os.path.join(self.out_dir, "data"))

    def _check_manifest(self, manifest: dict) -> None:
        if manifest["n_buckets"] != self.n_buckets:
            raise ValueError(
                f"manifest has n_buckets={manifest['n_buckets']}, "
                f"writer configured with {self.n_buckets}"
            )

    def run(
        self,
        df: DataFrame,
        fail_after_jobs: int | None = None,
        fail_after_write: bool = False,
    ) -> dict:
        """Write all pending buckets in groups; resumable at group
        granularity. ``fail_after_jobs`` injects a crash before a group's
        write; ``fail_after_write`` injects one in the write→manifest
        window (tests the idempotent-overwrite guarantee)."""
        manifest = self.load_manifest()
        self._check_manifest(manifest)
        done = {int(b) for b in manifest["completed"]}
        pending = [b for b in range(self.n_buckets) if b not in done]
        bdf = self._with_bucket(df)
        jobs = 0
        for i in range(0, len(pending), self.buckets_per_job):
            group = pending[i : i + self.buckets_per_job]
            if fail_after_jobs is not None and jobs >= fail_after_jobs:
                raise RuntimeError(f"injected failure before bucket group {group}")
            t0 = time.perf_counter()
            part = bdf.filter(F.col("bucket").isin(group))
            self._write_group(part)
            if fail_after_write:
                raise RuntimeError(
                    f"injected failure after write, before manifest, group {group}"
                )
            rows_by_bucket = self._written_counts(part.sparkSession, group)
            dt = round(time.perf_counter() - t0, 3)
            new_version = manifest["version"] + 1
            for b in group:
                manifest["completed"][str(b)] = {
                    "rows": int(rows_by_bucket.get(b, 0)),
                    "wall_seconds": dt,
                    "version_completed": new_version,
                }
            manifest["version"] = new_version
            self._save_manifest(manifest)
            jobs += 1
        return manifest

    def run_pipeline(
        self,
        source_df: DataFrame,
        pipeline_fn,
        fail_after_jobs: int | None = None,
        fail_after_write: bool = False,
    ) -> dict:
        """Resumable FEATURE BACKFILL: the bucket filter is applied to the
        SOURCE (cheap, pushed before the expensive pipeline), and
        ``pipeline_fn(source_subset)`` runs once per bucket group — so a
        resume recomputes only pending buckets' features, never the whole
        table (``run(features_df)`` would re-derive the full pipeline per
        group just to filter it afterwards)."""
        manifest = self.load_manifest()
        self._check_manifest(manifest)
        done = {int(b) for b in manifest["completed"]}
        pending = [b for b in range(self.n_buckets) if b not in done]
        bsrc = self._with_bucket(source_df)
        jobs = 0
        for i in range(0, len(pending), self.buckets_per_job):
            group = pending[i : i + self.buckets_per_job]
            if fail_after_jobs is not None and jobs >= fail_after_jobs:
                raise RuntimeError(f"injected failure before bucket group {group}")
            t0 = time.perf_counter()
            part_src = bsrc.filter(F.col("bucket").isin(group)).drop("bucket")
            feats = self._with_bucket(pipeline_fn(part_src))
            self._write_group(feats)
            if fail_after_write:
                raise RuntimeError(
                    f"injected failure after write, before manifest, group {group}"
                )
            rows_by_bucket = self._written_counts(feats.sparkSession, group)
            dt = round(time.perf_counter() - t0, 3)
            new_version = manifest["version"] + 1
            for b in group:
                manifest["completed"][str(b)] = {
                    "rows": int(rows_by_bucket.get(b, 0)),
                    "wall_seconds": dt,
                    "version_completed": new_version,
                }
            manifest["version"] = new_version
            self._save_manifest(manifest)
            jobs += 1
        return manifest

    def _written_counts(self, spark, group) -> dict[int, int]:
        """Per-bucket row counts from the freshly written parquet footers
        (metadata-only scan) — avoids running the pipeline twice per
        group just to count."""
        out = {}
        for b in group:
            path = os.path.join(self.out_dir, "data", f"bucket={b}")
            if os.path.exists(path):
                out[b] = spark.read.parquet(path).count()
            else:
                out[b] = 0
        return out

    def read_back(self, spark) -> DataFrame:
        return spark.read.parquet(os.path.join(self.out_dir, "data"))

    # ------------------------------------------------- snapshot reads

    def snapshots(self) -> list[dict]:
        """The table's snapshot history: one entry per manifest version
        at which buckets became visible, with cumulative bucket/row
        counts — the Iceberg ``snapshots`` metadata-table analog."""
        manifest = self.load_manifest()
        by_version: dict[int, list[dict]] = {}
        for info in manifest["completed"].values():
            by_version.setdefault(
                int(info.get("version_completed", 0)), []
            ).append(info)
        out, buckets, rows = [], 0, 0
        for v in sorted(by_version):
            buckets += len(by_version[v])
            rows += sum(int(i["rows"]) for i in by_version[v])
            out.append({"version": v, "buckets": buckets, "rows": rows})
        return out

    def read_snapshot(self, spark, version: int) -> DataFrame:
        """TIME-TRAVEL read: the table exactly as of manifest
        ``version`` — only buckets whose completion was committed at or
        before that version are visible.

        Sound because completed buckets are APPEND-ONLY: ``run`` /
        ``run_pipeline`` skip buckets already in the manifest, and the
        only rewrite (dynamic-partition-overwrite crash retry) targets
        buckets that were NOT yet committed — i.e. visible in no
        snapshot — so every snapshot's underlying files are immutable.
        Old manifests without ``version_completed`` degrade gracefully:
        their buckets count as version 0 (visible in every snapshot).
        The bucket filter prunes at the partition level (PartitionFilters
        — no data files of excluded buckets are read)."""
        manifest = self.load_manifest()
        if not 0 <= version <= int(manifest["version"]):
            # a version beyond the table's history would silently read
            # the LIVE table while the caller records it as a pinned,
            # reproducible snapshot — reject instead (the reproducibility
            # contract is the whole point of this read path)
            raise ValueError(
                f"snapshot version {version} does not exist: table "
                f"{self.out_dir!r} has versions 0..{manifest['version']}"
            )
        visible = [
            int(b)
            for b, info in manifest["completed"].items()
            if int(info.get("version_completed", 0)) <= version
        ]
        df = self.read_back(spark)
        return df.filter(F.col("bucket").isin(visible))
