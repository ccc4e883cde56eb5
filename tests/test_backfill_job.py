"""End-to-end spark-submit job entry (jobs/run_backfill.py) smoke."""

import json
import os
import subprocess
import sys

from nuclei_feature_extraction_spark.fixtures import fixtures_dir

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_backfill_cli_end_to_end(spark, tmp_path):
    d = fixtures_dir("tiny")
    out = str(tmp_path / "features.parquet")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    res = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "run_backfill.py"),
            "--transcripts", os.path.join(d, "transcripts.parquet"),
            "--side-profile", os.path.join(d, "side_user_profile.parquet"),
            "--side-config", os.path.join(d, "side_model_config.parquet"),
            "--output", out,
            "--feature-sets", "window", "runlen",
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    got = spark.read.parquet(out)
    assert got.count() == summary["rows"] > 0
    assert "runlen_gln_role" in got.columns and "plan" in got.columns


def test_backfill_cli_rejects_unknown_set(tmp_path):
    res = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "run_backfill.py"),
            "--transcripts", "x.parquet", "--output", "y.parquet",
            "--feature-sets", "bogus",
        ],
        capture_output=True, text=True, timeout=120, cwd=REPO,
    )
    assert res.returncode != 0
    assert "unknown feature set" in res.stderr


def test_package_zip(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import package

    out = package.main()
    assert os.path.exists(out)
    import zipfile

    names = zipfile.ZipFile(out).namelist()
    assert "nuclei_feature_extraction_spark/plans/pipeline.py" in names


def test_backfill_cli_output_checkpoint_mutual_exclusion():
    import pytest

    import jobs.run_backfill as job

    with pytest.raises(SystemExit):
        job.parse_args(
            ["--transcripts", "x.parquet", "--output", "y.parquet",
             "--checkpoint-dir", "/tmp/ck"]
        )
    with pytest.raises(SystemExit):
        job.parse_args(["--transcripts", "x.parquet"])


def test_backfill_cli_checkpointed_rows_from_manifest(spark, tmp_path, tiny_pdf):
    """Checkpointed backfill reports rows summed from the manifest (one
    Spark job per bucket group — a single Observation would undercount)."""
    import json as _json

    import jobs.run_backfill as job

    src = str(tmp_path / "tr.parquet")
    spark.createDataFrame(tiny_pdf).write.parquet(src)
    ck = str(tmp_path / "ck")
    mpath = str(tmp_path / "m.json")
    rc = job.main(
        ["--transcripts", src, "--checkpoint-dir", ck, "--n-buckets", "4",
         "--feature-sets", "session", "--metrics-out", mpath]
    )
    assert rc == 0
    m = _json.load(open(mpath))
    assert m["rows"] == len(tiny_pdf)
    assert spark.read.parquet(m["data_dir"]).count() == len(tiny_pdf)
