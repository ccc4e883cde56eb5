"""Multimodal plumbing + scan-pruning evidence."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from nuclei_feature_extraction_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_media_features,
    filter_media,
    synthesize_media,
)
from nuclei_feature_extraction_spark.sources.io import write_iceberg_style


def test_media_feature_plumbing(spark):
    media = synthesize_media(spark, n=48)
    feats = extract_media_features(media).toPandas()
    assert len(feats) == 48
    assert feats["feat"].map(len).eq(FEATURE_DIM).all()
    v = np.stack(feats["feat"].to_numpy())
    assert ((v >= 0) & (v <= 1)).all()
    # deterministic across runs
    again = extract_media_features(synthesize_media(spark, n=48)).toPandas()
    a = np.stack(feats.sort_values("media_id")["feat"].to_numpy())
    b = np.stack(again.sort_values("media_id")["feat"].to_numpy())
    assert np.array_equal(a, b)


def test_media_decode_stub_gate(spark):
    media = synthesize_media(spark, n=4)
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        extract_media_features(media, decode_stub=False).collect()


def test_media_metadata_filter(spark):
    media = synthesize_media(spark, n=64)
    out = filter_media(media, kinds=["image"], max_duration_s=100.0).toPandas()
    assert (out["kind"] == "image").all()


def _formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_parquet_filter_pushdown_and_column_pruning(spark, tiny_df, tmp_path):
    p = str(tmp_path / "t.parquet")
    tiny_df.write.parquet(p)
    df = (
        spark.read.parquet(p)
        .filter(F.col("conv_id") == "conv000001")
        .select("conv_id", "turn_idx")
    )
    plan = _formatted_plan(df)
    assert "PushedFilters: [IsNotNull(conv_id), EqualTo(conv_id,conv000001)]" in plan
    # column pruning: the scan must read only the 2 projected columns
    rs = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "text" not in rs and "turn_idx" in rs


def test_iceberg_style_partition_pruning(spark, tiny_df, tmp_path):
    p = str(tmp_path / "iceberg_like")
    write_iceberg_style(tiny_df, p, n_buckets=8)
    df = spark.read.parquet(p).filter(
        (F.col("bucket") == 3) & (F.col("dt") == "2024-02-01")
    )
    plan = _formatted_plan(df)
    # partition filters prune directories before any row is read
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:200]
