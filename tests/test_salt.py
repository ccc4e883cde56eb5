import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from nuclei_feature_extraction_spark.operators.salt import (
    detect_heavy_keys,
    salted_agg,
    with_salted_key,
)


def _skewed(spark):
    big = pd.DataFrame(
        {
            "conv_id": ["mega"] * 5000 + [f"c{i}" for i in range(50)],
            "turn_idx": np.r_[np.arange(5000), np.zeros(50)].astype(np.int32),
            "v": np.r_[np.arange(5000, dtype=float), np.ones(50)],
        }
    )
    return spark.createDataFrame(big)


def test_detect_heavy_keys(spark):
    df = _skewed(spark)
    heavy = detect_heavy_keys(df, threshold_rows=1000).toPandas()
    assert heavy["conv_id"].tolist() == ["mega"]


def test_salted_key_splits_only_heavy(spark):
    df = _skewed(spark)
    out = with_salted_key(df, block=1024, threshold_rows=1000)
    pdf = out.toPandas()
    mega = pdf[pdf.conv_id == "mega"]
    others = pdf[pdf.conv_id != "mega"]
    assert mega["salted_key"].nunique() == 5  # ceil(5000/1024)
    assert (others["salted_key"] == others["conv_id"]).all()
    assert len(pdf) == df.count()  # row-preserving


def test_salted_agg_matches_plain_agg(spark):
    df = _skewed(spark)
    got = (
        salted_agg(
            df, "conv_id", "turn_idx",
            [("v", "sum"), ("v", "min"), ("v", "max")],
            block=512, threshold_rows=1000,
        )
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    want = (
        df.groupBy("conv_id")
        .agg(F.sum("v").alias("v_sum"), F.min("v").alias("v_min"), F.max("v").alias("v_max"))
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert (got["conv_id"] == want["conv_id"]).all()
    for c in ("v_sum", "v_min", "v_max"):
        assert np.allclose(got[c], want[c]), c
