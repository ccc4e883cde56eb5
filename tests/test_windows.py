import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from nuclei_feature_extraction_spark.operators import (
    with_circular_time_mean,
    with_lag_lead,
    with_masked_rolling,
    with_rolling,
)
from nuclei_feature_extraction_spark.operators.windows import (
    multi_scale_rolling_bank,
)


def _signal(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort").copy()
    pdf["tlen"] = pdf["text"].str.len().astype(float)
    return pdf


def _with_tlen(df):
    return df.withColumn("tlen", F.length("text").cast("double"))


def test_lag_lead_matches_pandas(spark, tiny_df, tiny_pdf):
    got = (
        with_lag_lead(_with_tlen(tiny_df), ["tlen"], lags=(1, 2), leads=(1,))
        .select("conv_id", "turn_idx", "tlen_lag1", "tlen_lag2", "future_tlen_lead1")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pdf = _signal(tiny_pdf)
    g = pdf.groupby("conv_id")["tlen"]
    want1 = g.shift(1)
    want2 = g.shift(2)
    wantf = g.shift(-1)
    pdf2 = pdf.assign(w1=want1, w2=want2, wf=wantf).sort_values(
        ["conv_id", "turn_idx"]
    )
    assert np.allclose(got["tlen_lag1"], pdf2["w1"], equal_nan=True)
    assert np.allclose(got["tlen_lag2"], pdf2["w2"], equal_nan=True)
    assert np.allclose(got["future_tlen_lead1"], pdf2["wf"], equal_nan=True)


def test_rolling_rows_matches_pandas(spark, tiny_df, tiny_pdf):
    got = (
        with_rolling(_with_tlen(tiny_df), "tlen", stats=("mean", "std", "min", "max"), rows=5)
        .select("conv_id", "turn_idx", "tlen_r5_mean", "tlen_r5_std", "tlen_r5_min", "tlen_r5_max")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pdf = _signal(tiny_pdf)
    r = pdf.groupby("conv_id")["tlen"].rolling(5, min_periods=1)
    want = pd.DataFrame(
        {
            "mean": r.mean().reset_index(drop=True),
            "std": r.std(ddof=0).reset_index(drop=True),
            "min": r.min().reset_index(drop=True),
            "max": r.max().reset_index(drop=True),
        }
    )
    want.index = pdf.index
    pdf2 = pd.concat([pdf, want], axis=1).sort_values(["conv_id", "turn_idx"])
    assert np.allclose(got["tlen_r5_mean"], pdf2["mean"])
    assert np.allclose(got["tlen_r5_std"].fillna(0), pdf2["std"].fillna(0), atol=1e-9)
    assert np.allclose(got["tlen_r5_min"], pdf2["min"])
    assert np.allclose(got["tlen_r5_max"], pdf2["max"])


def test_rolling_range_seconds_matches_pandas(spark, tiny_df, tiny_pdf):
    got = (
        with_rolling(_with_tlen(tiny_df), "tlen", stats=("mean", "count"), seconds=3600)
        .select("conv_id", "turn_idx", "tlen_s3600_mean", "tlen_s3600_count")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pdf = _signal(tiny_pdf)

    def per_conv(g: pd.DataFrame) -> pd.DataFrame:
        t = g["ts"].astype("datetime64[us]").astype(np.int64) // 1_000_000
        means, counts = [], []
        for i in range(len(g)):
            m = (t >= t.iloc[i] - 3600) & (t <= t.iloc[i])
            means.append(g["tlen"][m.to_numpy()].mean())
            counts.append(int(m.sum()))
        return g.assign(wmean=means, wcount=counts)

    want = (
        pdf.groupby("conv_id", group_keys=False)[pdf.columns]
        .apply(per_conv)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert np.allclose(got["tlen_s3600_mean"], want["wmean"])
    assert (got["tlen_s3600_count"].to_numpy() == want["wcount"].to_numpy()).all()


def test_masked_rolling_matches_pandas(spark, tiny_df, tiny_pdf):
    got = (
        with_masked_rolling(
            _with_tlen(tiny_df), "tlen", F.col("role") == "assistant", "asst", rows=10
        )
        .select("conv_id", "turn_idx", "tlen_asst_r10_mean", "tlen_asst_r10_std")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pdf = _signal(tiny_pdf)
    pdf["masked"] = pdf["tlen"].where(pdf["role"] == "assistant")
    r = pdf.groupby("conv_id")["masked"].rolling(10, min_periods=1)
    mean = r.mean().reset_index(drop=True)
    std = r.std(ddof=0).reset_index(drop=True)
    mean.index = std.index = pdf.index
    pdf2 = pdf.assign(m=mean, s=std).sort_values(["conv_id", "turn_idx"])
    assert np.allclose(
        got["tlen_asst_r10_mean"].to_numpy(dtype=float),
        pdf2["m"].to_numpy(dtype=float),
        equal_nan=True,
    )
    assert np.allclose(
        got["tlen_asst_r10_std"].to_numpy(dtype=float),
        pdf2["s"].to_numpy(dtype=float),
        equal_nan=True,
        atol=1e-9,
    )


def test_circular_time_mean_range_and_oracle(spark, tiny_df, tiny_pdf):
    got = (
        with_circular_time_mean(tiny_df, rows=8)
        .select("conv_id", "turn_idx", "tod_circmean_r8")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    v = got["tod_circmean_r8"].to_numpy()
    assert ((v >= 0) & (v < 360)).all()
    pdf = _signal(tiny_pdf)
    sec = (
        pdf["ts"].astype("datetime64[us]").astype(np.int64) % 86_400_000_000
    ) / 1e6
    theta = sec / 86400.0 * 2 * np.pi
    pdf["sin"], pdf["cos"] = np.sin(theta), np.cos(theta)
    g = pdf.groupby("conv_id")
    ms = g["sin"].rolling(8, min_periods=1).mean().reset_index(drop=True)
    mc = g["cos"].rolling(8, min_periods=1).mean().reset_index(drop=True)
    ms.index = mc.index = pdf.index
    want = (np.degrees(np.arctan2(ms, mc)) + 360.0) % 360.0
    pdf2 = pdf.assign(w=want).sort_values(["conv_id", "turn_idx"])
    assert np.allclose(v, pdf2["w"].to_numpy(), atol=1e-6)


def test_multi_scale_bank_column_grid(spark, tiny_df):
    out = multi_scale_rolling_bank(
        _with_tlen(tiny_df), "tlen", windows=(4, 8), stats=("mean", "std")
    )
    new = [c for c in out.columns if c.startswith("tlen_bank_")]
    assert sorted(new) == sorted(
        ["tlen_bank_w4_mean", "tlen_bank_w4_std", "tlen_bank_w8_mean", "tlen_bank_w8_std"]
    )
    # single Window sort should serve all scales: check it computes
    assert out.limit(5).count() == 5


def test_gabor_bank_matches_numpy_oracle(spark, tiny_df, tiny_pdf):
    """gabor_rolling_bank == naive per-conversation numpy convolution:
    response_{w,p}(t) = stat over last w rows of cos(2π·pos/w + φ_p)·x."""
    from nuclei_feature_extraction_spark.operators.windows import (
        gabor_rolling_bank,
    )

    windows, n_phases = (4, 16), 3
    cols = [
        f"tlen_gabor_w{w}_p{p}_{s}"
        for w in windows
        for p in range(n_phases)
        for s in ("mean", "std")
    ]
    got = (
        gabor_rolling_bank(
            _with_tlen(tiny_df), "tlen", windows=windows, n_phases=n_phases
        )
        .select("conv_id", "turn_idx", *cols)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pdf = _signal(tiny_pdf)
    for w in windows:
        for p in range(n_phases):
            phi = p * np.pi / n_phases
            means, stds = [], []
            for _, g in pdf.groupby("conv_id", sort=False):
                x = g["tlen"].to_numpy()
                pos = np.arange(len(x))
                m = np.cos(pos * 2 * np.pi / w + phi) * x
                for t in range(len(x)):
                    lo = max(0, t - w + 1)
                    means.append(m[lo : t + 1].mean())
                    stds.append(m[lo : t + 1].std())
            key = pdf.assign(_m=means, _s=stds).sort_values(
                ["conv_id", "turn_idx"]
            )
            assert np.allclose(
                got[f"tlen_gabor_w{w}_p{p}_mean"], key["_m"], atol=1e-9
            ), (w, p)
            assert np.allclose(
                got[f"tlen_gabor_w{w}_p{p}_std"], key["_s"], atol=1e-9
            ), (w, p)


def test_gabor_full_reference_grid_shape(spark, tiny_df):
    """The operator honors the reference's 6-scale × 8-phase × 2-stat
    parameter grid (texture.rs:319-361): 96 columns, all finite-or-nan
    doubles, named per the grid convention."""
    from nuclei_feature_extraction_spark.operators.windows import (
        gabor_rolling_bank,
    )

    out = gabor_rolling_bank(_with_tlen(tiny_df), "tlen", n_phases=8)
    grid = [c for c in out.columns if c.startswith("tlen_gabor_")]
    assert len(grid) == 6 * 8 * 2
    assert "tlen_gabor_w128_p7_std" in grid
    assert out.select(grid[:4]).count() == tiny_df.count()


def test_circular_recentered_std_matches_numpy(spark, tiny_df, tiny_pdf):
    """A3 (color.rs:50-53): circular-mean recenter then population std,
    per conversation, vs direct numpy."""
    from nuclei_feature_extraction_spark.operators.windows import (
        circular_recentered_std,
    )

    got = (
        circular_recentered_std(tiny_df, group_col="conv_id")
        .select("conv_id", "tod_circmean_deg", "tod_recentered_std_deg")
        .distinct()
        .toPandas()
        .set_index("conv_id")
        .sort_index()
    )
    pdf = _signal(tiny_pdf)
    for conv, g in pdf.groupby("conv_id"):
        sec = g["ts"].astype("datetime64[us]").astype(np.int64) / 1e6
        theta = (sec % 86400.0) / 86400.0 * 2 * np.pi
        mu = np.arctan2(np.sin(theta).mean(), np.cos(theta).mean())
        dev = np.mod(theta.to_numpy() - mu + np.pi, 2 * np.pi) - np.pi
        want_mean = np.degrees(mu) % 360.0
        want_std = np.degrees(dev.std())  # ndarray std = population (ddof=0)
        assert abs(got.loc[conv, "tod_circmean_deg"] - want_mean) < 1e-6, conv
        assert abs(got.loc[conv, "tod_recentered_std_deg"] - want_std) < 1e-6, conv
