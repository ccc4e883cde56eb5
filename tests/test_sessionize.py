import numpy as np
import pandas as pd

from nuclei_feature_extraction_spark.operators import sessionize


def oracle_sessionize(pdf: pd.DataFrame, gap_minutes: float = 30.0) -> pd.DataFrame:
    """Pure-pandas oracle: gap strictly > cutoff starts a new session."""
    pdf = pdf.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort").copy()
    gap = pdf.groupby("conv_id")["ts"].diff().dt.total_seconds()
    new = (gap > gap_minutes * 60).fillna(False).astype(int)
    pdf["session_id"] = new.groupby(pdf["conv_id"]).cumsum().astype("int32")
    return pdf


def test_sessionize_matches_pandas_oracle(spark, tiny_df, tiny_pdf):
    got = (
        sessionize(tiny_df)
        .select("conv_id", "turn_idx", "session_id")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        oracle_sessionize(tiny_pdf)[["conv_id", "turn_idx", "session_id"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_exact_30min_gap_does_not_split(spark, edge_df):
    got = (
        sessionize(edge_df)
        .filter("conv_id = 'edge_exact30'")
        .orderBy("turn_idx")
        .select("session_id")
        .toPandas()["session_id"]
        .to_numpy()
    )
    assert (got == 0).all(), f"== 30min must not split, got {got}"


def test_30min_plus_gap_splits(spark, edge_df):
    got = (
        sessionize(edge_df)
        .filter("conv_id = 'edge_split'")
        .orderBy("turn_idx")
        .select("session_id")
        .toPandas()["session_id"]
        .to_numpy()
    )
    assert list(got) == [0, 1]


def test_single_turn_conversation(spark, edge_df):
    got = (
        sessionize(edge_df)
        .filter("conv_id = 'edge_single'")
        .select("session_id")
        .toPandas()["session_id"]
        .to_numpy()
    )
    assert list(got) == [0]


def test_unsorted_ingestion_is_irrelevant(spark, edge_df):
    """edge_df is ingested shuffled; sessionize must not depend on
    physical order (it sorts inside the window)."""
    a = (
        sessionize(edge_df)
        .select("conv_id", "turn_idx", "session_id")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    b = (
        sessionize(edge_df.orderBy("conv_id", "turn_idx"))
        .select("conv_id", "turn_idx", "session_id")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_session_ids_dense_nonnegative(spark, tiny_df):
    got = sessionize(tiny_df).groupBy("conv_id").agg(
        {"session_id": "min"}
    ).toPandas()
    assert (got["min(session_id)"] == 0).all()
