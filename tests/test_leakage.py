"""Zero-temporal-leakage: static plan audit + runtime property tests
(SURVEY.md §5.3)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from nuclei_feature_extraction_spark.plans.leakage import (
    LeakageError,
    audit_no_future_frames,
    verified_feature_columns,
)
from nuclei_feature_extraction_spark.plans.pipeline import build_features


def _w():
    return Window.partitionBy("conv_id").orderBy("ts", "turn_idx")


def test_audit_passes_on_trailing_frames(spark, tiny_df):
    df = tiny_df.select(
        "*",
        F.lag("turn_idx").over(_w()).alias("prev_turn"),
        F.avg("turn_idx").over(_w().rowsBetween(-9, 0)).alias("roll"),
        F.sum("turn_idx")
        .over(_w().rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    audit_no_future_frames(df)  # must not raise


def test_audit_rejects_lead_without_quarantine(spark, tiny_df):
    df = tiny_df.select("*", F.lead("turn_idx").over(_w()).alias("next_turn"))
    with pytest.raises(LeakageError, match="next_turn"):
        audit_no_future_frames(df)


def test_audit_rejects_future_rows_frame(spark, tiny_df):
    df = tiny_df.select(
        "*", F.sum("turn_idx").over(_w().rowsBetween(0, 5)).alias("ahead")
    )
    with pytest.raises(LeakageError, match="ahead"):
        audit_no_future_frames(df)


def test_audit_allows_quarantined_lead(spark, tiny_df):
    df = tiny_df.select(
        "*", F.lead("turn_idx").over(_w()).alias("future_next_turn")
    )
    audit_no_future_frames(df)
    assert "future_next_turn" not in verified_feature_columns(df)


def test_full_pipeline_passes_audit(spark, tiny_df, side_profile_df, side_config_df):
    out = build_features(
        tiny_df,
        ["all"],
        side_profile=side_profile_df,
        side_config=side_config_df,
        lags=(1,),
        levels=(4,),
    )
    assert len(out.columns) > 60


@pytest.fixture(scope="module")
def pipeline_out(spark, tiny_df):
    out = (
        build_features(tiny_df, ["all"], lags=(1,), levels=(4,))
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    return out


def _feature_cols(pdf: pd.DataFrame) -> list[str]:
    base = {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
    return [c for c in pdf.columns if c not in base]


def _assert_anchor_rows_equal(a: pd.DataFrame, b: pd.DataFrame, cols):
    for c in cols:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind in "fc":
            ok = np.allclose(
                av.astype(float), bv.astype(float), rtol=1e-12, atol=1e-12,
                equal_nan=True,
            )
        else:
            ok = (pd.Series(av).fillna("∅") == pd.Series(bv).fillna("∅")).all()
        assert ok, f"leakage detected via column {c}: {av[:5]} vs {bv[:5]}"


def test_truncation_invariance(spark, tiny_df, tiny_pdf, pipeline_out):
    """Recompute on the table truncated at an anchor: the anchor's
    features must be identical — no feature reads rows after its ts."""
    cid = tiny_pdf.groupby("conv_id").size().sort_values().index[-2]
    conv = tiny_pdf[tiny_pdf.conv_id == cid].sort_values(["ts", "turn_idx"])
    anchor_positions = [0, len(conv) // 2, len(conv) - 1]
    cols = _feature_cols(pipeline_out)
    for pos in anchor_positions:
        t_anchor = conv["ts"].iloc[pos]
        truncated = tiny_pdf[
            (tiny_pdf.conv_id != cid)
            | (tiny_pdf.ts <= t_anchor)
        ]
        out_t = (
            build_features(
                spark.createDataFrame(truncated), ["all"], lags=(1,), levels=(4,)
            )
            .filter(F.col("conv_id") == cid)
            .toPandas()
            .sort_values(["conv_id", "turn_idx"])
        )
        anchor_turn = conv["turn_idx"].iloc[pos]
        a = pipeline_out[
            (pipeline_out.conv_id == cid) & (pipeline_out.turn_idx == anchor_turn)
        ].reset_index(drop=True)
        b = out_t[out_t.turn_idx == anchor_turn].reset_index(drop=True)
        assert len(a) == len(b) == 1
        _assert_anchor_rows_equal(a, b, cols)


def test_future_mutation_invariance(spark, tiny_pdf, pipeline_out):
    """Poison every row strictly after the anchor ts (garbage text/role/
    tool): features at and before the anchor must not move."""
    cid = tiny_pdf.groupby("conv_id").size().sort_values().index[-1]
    conv = tiny_pdf[tiny_pdf.conv_id == cid].sort_values(["ts", "turn_idx"])
    pos = len(conv) // 2
    t_anchor = conv["ts"].iloc[pos]
    poisoned = tiny_pdf.copy()
    after = (poisoned.conv_id == cid) & (poisoned.ts > t_anchor)
    poisoned.loc[after, "text"] = "GARBAGE" * 40
    poisoned.loc[after, "role"] = "system"
    poisoned.loc[after, "tool"] = "exec"
    out_p = (
        build_features(
            __import__("pyspark").sql.SparkSession.getActiveSession()
            .createDataFrame(poisoned),
            ["all"], lags=(1,), levels=(4,),
        )
        .filter(F.col("conv_id") == cid)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    cols = _feature_cols(pipeline_out)
    base = pipeline_out[pipeline_out.conv_id == cid].reset_index(drop=True)
    upto = conv["turn_idx"].iloc[: pos + 1].to_numpy()
    a = base[base.turn_idx.isin(upto)].reset_index(drop=True)
    b = out_p[out_p.turn_idx.isin(upto)].reset_index(drop=True)
    assert len(a) == len(b) == pos + 1
    _assert_anchor_rows_equal(a, b, cols)


def test_asof_side_after_anchor_never_selected(
    spark, tiny_df, side_profile_df
):
    """Side rows with effective_ts after the conversation's last turn
    exist in the fixture by construction; they must never appear."""
    from nuclei_feature_extraction_spark.operators import asof_join

    joined = asof_join(
        tiny_df, side_profile_df, on="conv_id", tie_cols=("plan",),
        keep_right_ts="matched_ts",
    )
    bad = joined.filter(F.col("matched_ts") > F.col("ts")).count()
    assert bad == 0
