import numpy as np
import pandas as pd
import pytest

from nuclei_feature_extraction_spark.operators import (
    asof_join,
    asof_join_broadcast,
    asof_join_cogrouped,
)


def oracle_asof(
    left: pd.DataFrame,
    right: pd.DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    vcols: list[str],
    tie_cols: list[str] = (),
) -> pd.DataFrame:
    """Pandas merge_asof oracle (backward, inclusive). Ties on right_ts
    resolved by greatest tie_cols (merge_asof keeps the LAST row among
    equal keys after a stable sort)."""
    l = left.sort_values(left_ts, kind="mergesort")
    r = right.sort_values([right_ts, *tie_cols], kind="mergesort")
    out = pd.merge_asof(
        l, r[[on, right_ts, *vcols]], left_on=left_ts, right_on=right_ts,
        by=on, direction="backward", allow_exact_matches=True,
    )
    return out.drop(columns=[right_ts])


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )


def test_asof_union_window_matches_pandas_oracle(
    spark, tiny_df, tiny_pdf, side_profile_df, side_profile_pdf
):
    got = asof_join(
        tiny_df,
        side_profile_df,
        on="conv_id",
        left_ts="ts",
        right_ts="effective_ts",
        tie_cols=("plan",),
    ).toPandas()
    want = oracle_asof(
        tiny_pdf, side_profile_pdf, "conv_id", "ts", "effective_ts",
        ["plan", "score"], ["plan"],
    )
    got, want = _sorted(got), _sorted(want)
    assert got["plan"].fillna("∅").tolist() == want["plan"].fillna("∅").tolist()
    assert np.allclose(
        got["score"].to_numpy(dtype=float),
        want["score"].to_numpy(dtype=float),
        equal_nan=True,
    )


def test_asof_cogrouped_matches_union_window(
    spark, tiny_df, side_profile_df
):
    a = _sorted(
        asof_join(
            tiny_df, side_profile_df, on="conv_id", tie_cols=("plan",)
        ).toPandas()
    )
    b = _sorted(
        asof_join_cogrouped(tiny_df, side_profile_df, on="conv_id").toPandas()
    )
    # cogrouped merge_asof breaks right-ts ties by last-after-sort =
    # greatest (right pre-sorted by effective_ts only, stable) — only
    # compare where ties don't matter: score equality check is enough on
    # this fixture (ties in effective_ts are measure-zero for float ts)
    assert np.allclose(
        a["score"].to_numpy(dtype=float),
        b["score"].to_numpy(dtype=float),
        equal_nan=True,
    )


def test_asof_broadcast_keyless(spark, tiny_df, side_config_df):
    got = asof_join_broadcast(
        tiny_df, side_config_df, left_ts="ts", right_ts="effective_ts"
    ).toPandas()
    cfg = side_config_df.toPandas().sort_values("effective_ts")
    rts = cfg["effective_ts"].to_numpy(dtype="datetime64[ns]").astype(np.int64)
    t = got["ts"].to_numpy(dtype="datetime64[ns]").astype(np.int64)
    idx = np.searchsorted(rts, t, side="right") - 1
    # config starts before the data range → every row matches
    assert (idx >= 0).all()
    want_model = cfg["model"].to_numpy()[idx]
    assert got["model"].tolist() == list(want_model)
    assert np.allclose(
        got["temperature"].to_numpy(dtype=float),
        cfg["temperature"].to_numpy()[idx],
    )


def test_asof_never_reads_future_side_rows(spark, tiny_df, side_profile_df):
    """Leakage probe: corrupt every side row strictly AFTER each anchor
    by shifting it far future with poisoned values — result must be
    identical."""
    from pyspark.sql import functions as F

    base = _sorted(
        asof_join(tiny_df, side_profile_df, on="conv_id", tie_cols=("plan",)).toPandas()
    )
    max_ts = tiny_df.agg(F.max("ts")).collect()[0][0]
    poisoned = side_profile_df.withColumn(
        "score",
        F.when(F.col("effective_ts") > F.lit(max_ts), F.lit(-9e9)).otherwise(
            F.col("score")
        ),
    )
    got = _sorted(
        asof_join(tiny_df, poisoned, on="conv_id", tie_cols=("plan",)).toPandas()
    )
    assert np.allclose(
        base["score"].to_numpy(dtype=float),
        got["score"].to_numpy(dtype=float),
        equal_nan=True,
    )
    assert not (got["score"] == -9e9).any()


def test_asof_inclusive_exact_ts_match(spark):
    """side update with effective_ts == anchor ts is picked (inclusive)."""
    t0 = pd.Timestamp("2024-02-01")
    left = spark.createDataFrame(
        pd.DataFrame(
            {"conv_id": ["c"], "turn_idx": np.array([0], dtype=np.int32), "ts": [t0]}
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c", "c"],
                "effective_ts": [t0 - pd.Timedelta(hours=1), t0],
                "plan": ["old", "exact"],
                "score": [0.1, 0.9],
            }
        )
    )
    got = asof_join(left, right, on="conv_id", tie_cols=("plan",)).toPandas()
    assert got["plan"].tolist() == ["exact"]


def test_asof_missing_key_yields_null(spark):
    t0 = pd.Timestamp("2024-02-01")
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["nope"],
                "turn_idx": np.array([0], dtype=np.int32),
                "ts": [t0],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["other"],
                "effective_ts": [t0],
                "plan": ["x"],
                "score": [1.0],
            }
        )
    )
    got = asof_join(left, right, on="conv_id").toPandas()
    assert got["plan"].isna().all() and got["score"].isna().all()
    inner = asof_join(left, right, on="conv_id", how="inner").toPandas()
    assert len(inner) == 0


def test_asof_tolerance(spark):
    t0 = pd.Timestamp("2024-02-01")
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c", "c"],
                "turn_idx": np.array([0, 1], dtype=np.int32),
                "ts": [t0, t0 + pd.Timedelta(hours=3)],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c"],
                "effective_ts": [t0 - pd.Timedelta(minutes=5)],
                "plan": ["p"],
                "score": [1.0],
            }
        )
    )
    got = (
        asof_join(left, right, on="conv_id", tolerance_seconds=3600)
        .orderBy("turn_idx")
        .toPandas()
    )
    assert got["plan"].tolist()[0] == "p"
    assert pd.isna(got["plan"].tolist()[1])


def test_asof_duplicate_right_ts_tiebreak(spark):
    t0 = pd.Timestamp("2024-02-01")
    left = spark.createDataFrame(
        pd.DataFrame(
            {"conv_id": ["c"], "turn_idx": np.array([0], dtype=np.int32),
             "ts": [t0 + pd.Timedelta(hours=1)]}
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c", "c"],
                "effective_ts": [t0, t0],
                "plan": ["aaa", "zzz"],
                "score": [0.0, 1.0],
            }
        )
    )
    got = asof_join(left, right, on="conv_id", tie_cols=("plan",)).toPandas()
    assert got["plan"].tolist() == ["zzz"]  # greatest tie wins, deterministic


def test_asof_broadcast_tie_cols_deterministic(spark):
    """Duplicate right_ts in the broadcast side: greatest tie_cols tuple
    wins, matching asof_join's convention."""
    import pandas as pd

    from nuclei_feature_extraction_spark.operators.asof import (
        asof_join_broadcast,
    )

    t = pd.Timestamp("2024-01-01 00:00:00")
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1], "ts": [t + pd.Timedelta(minutes=5)]})
    )
    side = pd.DataFrame(
        {
            "effective_ts": [t, t, t],
            "plan": ["a", "c", "b"],
            "score": [1.0, 3.0, 2.0],
        }
    )
    for order in ([0, 1, 2], [2, 1, 0], [1, 0, 2]):  # any incoming order
        got = asof_join_broadcast(
            left,
            spark.createDataFrame(side.iloc[order]),
            tie_cols=("plan",),
        ).toPandas()
        assert got["plan"].iloc[0] == "c" and got["score"].iloc[0] == 3.0


def test_asof_skewed_key_strategies_agree_and_hint(spark):
    """One key holds ~10% of all rows (the mega-conversation case AQE
    cannot split for windows/cogroups): both physical strategies return
    identical matches, and the hint routes the skewed table to the
    spillable union-window plan."""
    import numpy as np
    import pandas as pd

    from nuclei_feature_extraction_spark.operators.asof import (
        asof_join,
        asof_join_cogrouped,
        asof_strategy_hint,
    )

    rng = np.random.default_rng(17)
    n = 20_000
    keys = np.where(rng.random(n) < 0.10, "hot", rng.integers(0, 500, n).astype(str))
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 86_400, n), unit="s"
    )
    left = spark.createDataFrame(
        pd.DataFrame({"conv_id": keys, "ts": ts, "rid": np.arange(n)})
    )
    sk = np.concatenate([["hot"] * 20, rng.integers(0, 500, 200).astype(str)])
    side = pd.DataFrame(
        {
            "conv_id": sk,
            "effective_ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 86_400, len(sk)), unit="s"),
            "v": rng.random(len(sk)),
        }
    )
    sdf = spark.createDataFrame(side)
    a = (
        asof_join(left, sdf, on="conv_id", left_ts="ts", right_ts="effective_ts")
        .orderBy("rid").toPandas()
    )
    b = (
        asof_join_cogrouped(
            left, sdf, on="conv_id", left_ts="ts", right_ts="effective_ts"
        ).orderBy("rid").toPandas()
    )
    assert np.allclose(
        a["v"].to_numpy(dtype=float), b["v"].to_numpy(dtype=float), equal_nan=True
    )
    hint = asof_strategy_hint(left, "conv_id", sample_fraction=0.25)
    assert hint["strategy"] == "union_window"
    assert hint["hot_key_share"] >= 0.05
    uniform = left.filter(left["conv_id"] != "hot")
    assert (
        asof_strategy_hint(uniform, "conv_id", sample_fraction=0.5)["strategy"]
        == "cogrouped"
    )

def test_asof_restatement_all_strategies_agree(spark):
    """Side-data RE-STATEMENT (two side rows with the same key AND the
    same effective_ts — e.g. a corrected profile republished at the
    original timestamp): all three physical strategies resolve the
    duplicate to the SAME greatest-tie_cols row, and the payload is
    atomic — plan and score both come from the winning row, never a mix
    of columns across the duplicates (VERDICT r4 ask #8)."""
    import pandas as pd

    from nuclei_feature_extraction_spark.operators.asof import (
        asof_join,
        asof_join_broadcast,
        asof_join_cogrouped,
    )

    t0 = pd.Timestamp("2024-02-01")
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c", "c", "d"],
                "turn_idx": np.array([0, 1, 0], dtype=np.int32),
                "ts": [t0 + pd.Timedelta(hours=1),
                       t0 + pd.Timedelta(hours=2),
                       t0 + pd.Timedelta(hours=1)],
            }
        )
    )
    # conv c: original row (plan=aaa, score=0.1) re-stated at the SAME
    # ts (plan=zzz, score=0.9), plus a later second re-statement pair;
    # conv d: a single clean row
    right_pdf = pd.DataFrame(
        {
            "conv_id": ["c", "c", "c", "c", "d"],
            "effective_ts": [t0, t0,
                             t0 + pd.Timedelta(minutes=90),
                             t0 + pd.Timedelta(minutes=90), t0],
            "plan": ["aaa", "zzz", "mmm", "bbb", "solo"],
            "score": [0.1, 0.9, 0.5, 0.2, 0.7],
        }
    )
    right = spark.createDataFrame(right_pdf)

    def norm(pdf):
        return (
            pdf.sort_values(["conv_id", "turn_idx"])[
                ["conv_id", "turn_idx", "plan", "score"]
            ].reset_index(drop=True)
        )

    got_uw = norm(
        asof_join(left, right, on="conv_id", tie_cols=("plan",)).toPandas()
    )
    got_cg = norm(
        asof_join_cogrouped(
            left, right, on="conv_id", tie_cols=("plan",)
        ).toPandas()
    )
    # greatest plan wins at each duplicated ts; score rides with it
    assert got_uw["plan"].tolist() == ["zzz", "mmm", "solo"]
    assert got_uw["score"].tolist() == [0.9, 0.5, 0.7]
    assert got_cg.equals(got_uw)

    # broadcast strategy is keyless — exercise the same re-statement on
    # the single-conversation slice
    left_c = left.filter("conv_id = 'c'")
    got_bc = norm(
        asof_join_broadcast(
            left_c,
            spark.createDataFrame(right_pdf[right_pdf["conv_id"] == "c"]
                                  .drop(columns=["conv_id"])),
            tie_cols=("plan",),
        ).toPandas()
    )
    assert got_bc["plan"].tolist() == ["zzz", "mmm"]
    assert got_bc["score"].tolist() == [0.9, 0.5]
