"""Pipeline invariants: per-turn text equality, stable ordering,
determinism across parallelism, registry expansion."""

import numpy as np
import pandas as pd
import pytest

from nuclei_feature_extraction_spark.plans.pipeline import build_features
from nuclei_feature_extraction_spark.plans.registry import (
    ALIASES,
    FEATURE_REGISTRY,
    expand_feature_sets,
)


def test_registry_alias_expansion_and_dedup():
    assert expand_feature_sets(["all"]) == ALIASES["all"]
    # reference bug fixed: 'texture cooc' must not compute cooc twice
    # (args.rs:35-49 has no dedup)
    assert expand_feature_sets(["texture", "cooc"]) == ["cooc", "runlen", "xcooc", "bank", "gabor"]
    assert expand_feature_sets(["cooc", "texture"]) == ["cooc", "runlen", "xcooc", "bank", "gabor"]
    with pytest.raises(ValueError, match="unknown feature set"):
        expand_feature_sets(["nope"])
    assert set(ALIASES["all"]) == set(FEATURE_REGISTRY)


def test_per_turn_text_equality(spark, tiny_df, tiny_pdf):
    """input_hint invariant: output preserves text byte-for-byte under
    stable (conv_id, turn_idx) ordering."""
    out = (
        build_features(tiny_df, ["window"], audit=True)
        .select("conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    want = (
        tiny_pdf[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(out) == len(want)
    assert (out["text"] == want["text"]).all()
    assert (out["conv_id"] == want["conv_id"]).all()
    assert (out["turn_idx"].to_numpy() == want["turn_idx"].to_numpy()).all()


def test_row_count_preserved_with_kernels(spark, tiny_df):
    out = build_features(tiny_df, ["all"], lags=(1,), levels=(4,))
    assert out.count() == tiny_df.count()


def test_determinism_across_parallelism(spark, tiny_pdf):
    """Same input, different shuffle-partition counts and input
    partitioning → identical sorted output (guards against the
    reference's nondeterministic batch-completion ordering,
    main.rs:96-108)."""
    results = []
    for parts, slices in ((2, 3), (7, 11)):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            df = spark.createDataFrame(
                tiny_pdf.sample(frac=1.0, random_state=parts),  # shuffled input
                schema="conv_id string, turn_idx int, role string, "
                "text string, tool string, ts timestamp",
            ).repartition(slices)
            out = (
                build_features(df, ["window", "runlen"])
                .toPandas()
                .sort_values(["conv_id", "turn_idx"], kind="mergesort")
                .reset_index(drop=True)
            )
            results.append(out)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "4")
    a, b = results
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind in "fc":
            assert np.allclose(
                av.to_numpy(dtype=float), bv.to_numpy(dtype=float),
                rtol=0, atol=0, equal_nan=True,
            ), f"nondeterministic column {c}"
        else:
            assert (av.fillna("∅") == bv.fillna("∅")).all(), c


def test_all_features_are_verified_columns(spark, tiny_df):
    from nuclei_feature_extraction_spark.plans.leakage import (
        verified_feature_columns,
    )

    out = build_features(tiny_df, ["all"], lags=(1,), levels=(4,))
    assert verified_feature_columns(out) == list(out.columns)
    out2 = build_features(
        tiny_df, ["window"], leads=(1,), audit=True
    )
    future = [c for c in out2.columns if c.startswith("future_")]
    assert future and all(
        c not in verified_feature_columns(out2) for c in future
    )
