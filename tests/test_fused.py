"""Fused single-shuffle pipeline == composable Catalyst pipeline,
column for column (transfers all leakage/determinism properties)."""

import numpy as np
import pandas as pd

from nuclei_feature_extraction_spark.plans.fused import build_features_fused
from nuclei_feature_extraction_spark.plans.pipeline import build_features


def _sorted(pdf):
    return pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )


def test_fused_matches_composable(spark, tiny_df, side_profile_df, side_config_df):
    fused = _sorted(
        build_features_fused(
            tiny_df, side_profile=side_profile_df, side_config=side_config_df,
            lags=(1,), levels=(4,),
        ).toPandas()
    )
    comp = _sorted(
        build_features(
            tiny_df, ["all"], side_profile=side_profile_df,
            side_config=side_config_df, lags=(1,), levels=(4,),
        ).toPandas()
    )
    assert len(fused) == len(comp) == tiny_df.count()
    assert set(fused.columns) == set(comp.columns), (
        sorted(set(fused.columns) ^ set(comp.columns))
    )
    for c in comp.columns:
        a, b = fused[c], comp[c]
        if a.dtype.kind in "fc" or b.dtype.kind in "fc":
            assert np.allclose(
                a.to_numpy(dtype=float), b.to_numpy(dtype=float),
                rtol=1e-9, atol=1e-9, equal_nan=True,
            ), f"column {c} diverges"
        else:
            assert (a.fillna("∅").astype(str) == b.fillna("∅").astype(str)).all(), c


def test_fused_without_sides(spark, tiny_df):
    fused = build_features_fused(tiny_df, lags=(1,), levels=(4,))
    n = fused.count()
    assert n == tiny_df.count()
    assert "plan" not in fused.columns and "model" not in fused.columns


def test_fused_text_byte_equality(spark, tiny_df, tiny_pdf):
    got = _sorted(
        build_features_fused(tiny_df, lags=(1,), levels=(4,))
        .select("conv_id", "turn_idx", "text")
        .toPandas()
    )
    want = _sorted(tiny_pdf[["conv_id", "turn_idx", "text"]])
    assert (got["text"] == want["text"]).all()


def test_fused_long_out_of_profile_id_does_not_match(spark, tiny_pdf):
    """Regression: an out-of-profile conv id LONGER than every profile
    id must get null plan/score — casting to the profile array's fixed
    '<U' width used to truncate it to a prefix that falsely matched."""
    base = tiny_pdf[tiny_pdf["conv_id"] == tiny_pdf["conv_id"].iloc[0]].copy()
    longer = base.copy()
    longer["conv_id"] = base["conv_id"] + "0"  # prefix == an in-profile id
    both = pd.concat([base, longer], ignore_index=True)
    profile = pd.DataFrame(
        {
            "conv_id": [base["conv_id"].iloc[0]],
            "effective_ts": [base["ts"].min()],
            "plan": ["pro"],
            "score": [0.5],
        }
    )
    out = build_features_fused(
        spark.createDataFrame(both),
        side_profile=spark.createDataFrame(profile),
        lags=(1,), levels=(4,),
    ).select("conv_id", "plan", "score").toPandas()
    short = out[out["conv_id"] == base["conv_id"].iloc[0]]
    long_ = out[out["conv_id"] != base["conv_id"].iloc[0]]
    assert (short["plan"] == "pro").all()
    assert long_["plan"].isna().all(), "truncated-id false match"
    assert long_["score"].isna().all()


def test_fused_broadcast_fallback_matches_composable(
    spark, tiny_df, side_profile_df, side_config_df
):
    """Forcing the side tables past the broadcast guard must route them
    through the union-window as-of fallback with identical results."""
    forced = _sorted(
        build_features_fused(
            tiny_df, side_profile=side_profile_df, side_config=side_config_df,
            lags=(1,), levels=(4,), max_broadcast_side_rows=1,
        ).toPandas()
    )
    comp = _sorted(
        build_features(
            tiny_df, ["all"], side_profile=side_profile_df,
            side_config=side_config_df, lags=(1,), levels=(4,),
        ).toPandas()
    )
    assert set(forced.columns) == set(comp.columns)
    for c in comp.columns:
        a, b = forced[c], comp[c]
        if a.dtype.kind in "fc" or b.dtype.kind in "fc":
            assert np.allclose(
                a.to_numpy(dtype=float), b.to_numpy(dtype=float),
                rtol=1e-9, atol=1e-9, equal_nan=True,
            ), f"column {c} diverges under fallback"
        else:
            assert (a.fillna("∅").astype(str) == b.fillna("∅").astype(str)).all(), c


def test_fused_full_reference_grid_parity(spark, tiny_df, side_profile_df, side_config_df):
    """Fused == composable at the COMPLETE reference-class grid
    (texture.rs:19-20: d∈{1,2,3,5} × K∈{4,8,16,32}) — the width used by
    tools/fullwidth_bench.py; parity must hold there, not only at the
    small default grid."""
    lags, levels = (1, 2, 3, 5), (4, 8, 16, 32)
    fused = _sorted(
        build_features_fused(
            tiny_df, side_profile=side_profile_df, side_config=side_config_df,
            lags=lags, levels=levels,
        ).toPandas()
    )
    comp = _sorted(
        build_features(
            tiny_df, ["all"], side_profile=side_profile_df,
            side_config=side_config_df, lags=lags, levels=levels,
        ).toPandas()
    )
    assert len(fused.columns) > 380, len(fused.columns)
    assert set(fused.columns) == set(comp.columns)
    for c in comp.columns:
        a, b = fused[c], comp[c]
        if a.dtype.kind in "fc" or b.dtype.kind in "fc":
            assert np.allclose(
                a.to_numpy(dtype=float), b.to_numpy(dtype=float),
                rtol=1e-9, atol=1e-9, equal_nan=True,
            ), f"column {c} diverges at full grid"
        else:
            assert (a.fillna("∅").astype(str) == b.fillna("∅").astype(str)).all(), c


def test_arrow_backend_matches_pandas_backend(
    spark, tiny_df, side_profile_df, side_config_df
):
    """The mapInArrow backend (strings never box into Python) must be
    VALUE-identical to the original mapInPandas formulation — floats
    bit-equal via repr, strings/nulls equal."""
    kw = dict(
        side_profile=side_profile_df, side_config=side_config_df,
        lags=(1,), levels=(4,),
    )
    arrow = _sorted(
        build_features_fused(tiny_df, backend="arrow", **kw).toPandas()
    )
    pandas = _sorted(
        build_features_fused(tiny_df, backend="pandas", **kw).toPandas()
    )
    assert list(arrow.columns) == list(pandas.columns)
    for c in arrow.columns:
        a, b = arrow[c], pandas[c]
        if a.dtype.kind in "fc":
            # repr equality = bit equality incl. NaN placement — the
            # backends must not even differ in last-bit float noise
            assert (
                a.astype(float).astype(str) == b.astype(float).astype(str)
            ).all(), c
        else:
            assert (a.fillna("∅").astype(str) == b.fillna("∅").astype(str)).all(), c
