"""Fused single-shuffle feature pipeline — the 100 TB hot path.

The composable pipeline (plans/pipeline.py) is Catalyst-first: window
families as built-in expressions, kernels as one mapInPandas, as-of as
a union-window. Ideal for ad-hoc feature subsets — but for the FULL
feature vector it carries ~120 columns through a window sort and an
as-of shuffle. Measured on 32 cores, those wide-row stages burn ~3×
more CPU-seconds at 32 threads than at 8 (cache/DRAM contention in the
sorter) — they are memory-bandwidth-bound, and scaling efficiency dies.

The fused plan moves the entire computation into ONE Arrow pass over
NARROW input rows (the 6 transcript columns):

    scan (6 cols) → repartition(conv_id) → sortWithinPartitions
      → mapInPandas[ kernels + window features + as-of merges ] → sink

Wide rows exist only AFTER the last exchange, flowing straight to the
sink. Side tables ride in as broadcast sorted arrays (searchsorted —
the reference's in-memory point-lookup source, utils.rs:141-206); for
side tables too big to broadcast, fall back to the composable
union-window as-of AFTER the fused pass (still one narrow shuffle for
the features themselves).

Output is column-for-column allclose-equal to the composable pipeline
(pinned by tests/test_fused.py), so every correctness property proven
there (leakage, determinism, text equality) transfers.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nuclei_feature_extraction_spark.functions.kernels import (
    DEFAULT_LAGS,
    DEFAULT_LEVELS,
    compute_features_pdf,
    feature_names,
    _seg_cumsum,
    _seg_pos,
)

TWO_PI = 2.0 * 3.141592653589793

GABOR_WINDOWS = (4, 16, 64)
GABOR_PHASES = 4

WINDOW_FEATURE_COLS = (
    ["session_id"]
    + [f"tlen_lag{k}" for k in (1, 2, 3)]
    + [f"role_lag{k}" for k in (1, 2, 3)]
    + [f"tlen_r20_{s}" for s in ("mean", "std", "min", "max")]
    + [f"tlen_asst_r20_{s}" for s in ("mean", "std")]
    + ["tod_circmean_r20"]
    + [f"tlen_bank_w{w}_{s}" for w in (4, 16, 64) for s in ("mean", "std")]
    + [
        f"tlen_gabor_w{w}_p{p}_{s}"
        for w in GABOR_WINDOWS
        for p in range(GABOR_PHASES)
        for s in ("mean", "std")
    ]
)


def _seg_shift_obj(arr: np.ndarray, pos: np.ndarray, k: int) -> np.ndarray:
    out = np.empty(len(arr), dtype=object)
    ok = pos >= k
    idx = np.maximum(np.arange(len(arr)) - k, 0)
    out[ok] = arr[idx[ok]]
    out[~ok] = None
    return out


def _seg_shift_f(arr: np.ndarray, pos: np.ndarray, k: int) -> np.ndarray:
    ok = pos >= k
    idx = np.maximum(np.arange(len(arr)) - k, 0)
    return np.where(ok, arr[idx], np.nan)


def _window_features_pdf(
    pdf: pd.DataFrame, gap_minutes: float = 30.0
) -> pd.DataFrame:
    """All window-family features over a sorted multi-conversation chunk,
    numerically identical to the Catalyst expressions in
    operators/windows.py (pinned by test_fused.py)."""
    conv, _ = pd.factorize(pdf["conv_id"].to_numpy(), sort=False)
    n = len(pdf)
    first = np.empty(n, dtype=bool)
    first[0] = True
    first[1:] = conv[1:] != conv[:-1]
    pos = _seg_pos(first)
    seg = np.cumsum(first)

    tlen = pdf["tlen"].to_numpy(dtype=np.float64)
    role = pdf["role"].to_numpy()
    us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
    sec = us / 1e6

    out: dict[str, np.ndarray] = {}
    # sessionize: strictly greater than the cutoff splits
    prev_sec = _seg_shift_f(sec, pos, 1)
    new_sess = (~np.isnan(prev_sec)) & ((sec - prev_sec) > gap_minutes * 60.0)
    out["session_id"] = _seg_cumsum(new_sess.astype(np.float64), first).astype(
        np.int32
    )
    for k in (1, 2, 3):
        out[f"tlen_lag{k}"] = _seg_shift_f(tlen, pos, k)
        out[f"role_lag{k}"] = _seg_shift_obj(role, pos, k)

    theta = (sec % 86400.0) / 86400.0 * TWO_PI
    masked = np.where(role == "assistant", tlen, np.nan)
    tmp_cols = {
        "seg": seg,
        "tlen": tlen,
        "masked": masked,
        "sin": np.sin(theta),
        "cos": np.cos(theta),
    }
    # Gabor quadrature bank: carrier modulation, numerically identical
    # to the Catalyst exprs in windows.gabor_rolling_bank
    for w in GABOR_WINDOWS:
        omega = TWO_PI / w
        for p in range(GABOR_PHASES):
            phi = p * 3.141592653589793 / GABOR_PHASES
            tmp_cols[f"g{w}_{p}"] = np.cos(pos * omega + phi) * tlen
    tmp = pd.DataFrame(tmp_cols)
    g = tmp.groupby("seg", sort=False)

    def roll(col: str, w: int):
        return g[col].rolling(w, min_periods=1)

    out["tlen_r20_mean"] = roll("tlen", 20).mean().to_numpy()
    out["tlen_r20_std"] = roll("tlen", 20).std(ddof=0).to_numpy()
    out["tlen_r20_min"] = roll("tlen", 20).min().to_numpy()
    out["tlen_r20_max"] = roll("tlen", 20).max().to_numpy()
    out["tlen_asst_r20_mean"] = roll("masked", 20).mean().to_numpy()
    out["tlen_asst_r20_std"] = roll("masked", 20).std(ddof=0).to_numpy()
    ms = roll("sin", 20).mean().to_numpy()
    mc = roll("cos", 20).mean().to_numpy()
    out["tod_circmean_r20"] = (np.degrees(np.arctan2(ms, mc)) + 360.0) % 360.0
    for w in (4, 16, 64):
        out[f"tlen_bank_w{w}_mean"] = roll("tlen", w).mean().to_numpy()
        out[f"tlen_bank_w{w}_std"] = roll("tlen", w).std(ddof=0).to_numpy()
    for w in GABOR_WINDOWS:
        for p in range(GABOR_PHASES):
            out[f"tlen_gabor_w{w}_p{p}_mean"] = (
                roll(f"g{w}_{p}", w).mean().to_numpy()
            )
            out[f"tlen_gabor_w{w}_p{p}_std"] = (
                roll(f"g{w}_{p}", w).std(ddof=0).to_numpy()
            )
    return pd.DataFrame(out, index=pdf.index)


def _asof_arrays(
    side: pd.DataFrame, ts_col: str, tie_cols: Sequence[str], value_cols: Sequence[str]
):
    side = side.sort_values([ts_col, *tie_cols], kind="mergesort")
    rts = side[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
    return rts, {c: side[c].to_numpy() for c in value_cols}


def _searchsorted_pick(
    rts: np.ndarray, vals: dict[str, np.ndarray], ts_us: np.ndarray
) -> dict[str, np.ndarray]:
    idx = np.searchsorted(rts, ts_us, side="right") - 1
    ok = idx >= 0
    safe = np.clip(idx, 0, None)
    out = {}
    for c, arr in vals.items():
        if arr.dtype.kind == "f":
            v = arr[safe].astype(np.float64)
            v[~ok] = np.nan
            out[c] = v
        else:
            v = arr[safe].astype(object)
            v[~ok] = None
            out[c] = v
    return out


def build_features_fused(
    df: DataFrame,
    side_profile: DataFrame | None = None,
    side_config: DataFrame | None = None,
    lags: Sequence[int] = DEFAULT_LAGS,
    levels: Sequence[int] = DEFAULT_LEVELS,
    gap_minutes: float = 30.0,
    num_partitions: int | None = None,
    max_broadcast_side_rows: int = 2_000_000,
) -> DataFrame:
    """Single-shuffle full feature vector; column-compatible with
    ``build_features(df, ["all"], side_profile, side_config)``.

    Side tables within ``max_broadcast_side_rows`` ride into the kernel
    as driver-built broadcast arrays (a Python dict of numpy arrays —
    2M rows ≈ low-hundreds of MB on the driver, hence the guard). A
    LARGER side table automatically falls back to the composable
    union-window as-of applied AFTER the fused pass: the features
    themselves still take exactly one narrow shuffle; only the as-of
    merge adds its own key-shuffle. The row count is checked with a
    cheap ``count()`` BEFORE any driver materialization."""
    spark = df.sparkSession

    fallback_profile = None
    if side_profile is not None and side_profile.count() > max_broadcast_side_rows:
        fallback_profile = side_profile
        side_profile = None
    fallback_config = None
    if side_config is not None and side_config.count() > max_broadcast_side_rows:
        fallback_config = side_config
        side_config = None

    profile_by_conv = None
    if side_profile is not None:
        ppd = side_profile.toPandas()
        ppd = ppd.sort_values(["effective_ts", "plan"], kind="mergesort")
        rts_all = ppd["effective_ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        profile_by_conv = {}
        for cid, idxs in ppd.groupby("conv_id", sort=False).indices.items():
            profile_by_conv[cid] = (
                rts_all[idxs],
                ppd["plan"].to_numpy()[idxs],
                ppd["score"].to_numpy()[idxs],
            )
    cfg_arrays = None
    if side_config is not None:
        cpd = side_config.toPandas()
        cfg_arrays = _asof_arrays(
            cpd, "effective_ts", (), [c for c in cpd.columns if c != "effective_ts"]
        )
    bc = spark.sparkContext.broadcast((profile_by_conv, cfg_arrays))

    kcols = feature_names(("cooc", "runlen", "shape"), lags, levels)
    fields = (
        list(df.schema.fields)
        + [T.StructField("tlen", T.DoubleType(), True)]
        + [
            T.StructField(nm, T.DoubleType(), True)
            for nm in kcols
        ]
        + [
            T.StructField("session_id", T.IntegerType(), True),
            *[T.StructField(f"tlen_lag{k}", T.DoubleType(), True) for k in (1, 2, 3)],
            *[T.StructField(f"role_lag{k}", T.StringType(), True) for k in (1, 2, 3)],
            *[
                T.StructField(f"tlen_r20_{s}", T.DoubleType(), True)
                for s in ("mean", "std", "min", "max")
            ],
            *[
                T.StructField(f"tlen_asst_r20_{s}", T.DoubleType(), True)
                for s in ("mean", "std")
            ],
            T.StructField("tod_circmean_r20", T.DoubleType(), True),
            *[
                T.StructField(f"tlen_bank_w{w}_{s}", T.DoubleType(), True)
                for w in (4, 16, 64)
                for s in ("mean", "std")
            ],
            *[
                T.StructField(f"tlen_gabor_w{w}_p{p}_{s}", T.DoubleType(), True)
                for w in GABOR_WINDOWS
                for p in range(GABOR_PHASES)
                for s in ("mean", "std")
            ],
        ]
    )
    if side_profile is not None:
        fields += [
            T.StructField("plan", T.StringType(), True),
            T.StructField("score", T.DoubleType(), True),
        ]
    if side_config is not None:
        for c in cpd.columns:
            if c != "effective_ts":
                fields.append(T.StructField(c, side_config.schema[c].dataType, True))
    schema = T.StructType(fields)

    prep = df.select("*", F.length("text").cast("double").alias("tlen"))
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    prep = prep.repartition(nparts, "conv_id").sortWithinPartitions(
        "conv_id", "ts", "turn_idx"
    )

    def process(chunk: pd.DataFrame) -> pd.DataFrame:
        prof, cfg = bc.value
        base = compute_features_pdf(
            chunk, ("cooc", "runlen", "shape"), lags, levels, passthrough=True
        )
        win = _window_features_pdf(base, gap_minutes)
        out = pd.concat([base, win], axis=1)
        ts_us = out["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        if prof is not None:
            plan = np.empty(len(out), dtype=object)
            score = np.full(len(out), np.nan)
            conv_arr = out["conv_id"].to_numpy()
            starts = np.flatnonzero(
                np.r_[True, conv_arr[1:] != conv_arr[:-1]]
            ).tolist() + [len(out)]
            for i in range(len(starts) - 1):
                lo, hi = starts[i], starts[i + 1]
                entry = prof.get(conv_arr[lo])
                if entry is None:
                    plan[lo:hi] = None
                    continue
                rts, pl, sc = entry
                idx = np.searchsorted(rts, ts_us[lo:hi], side="right") - 1
                ok = idx >= 0
                safe = np.clip(idx, 0, None)
                seg_plan = pl[safe].astype(object)
                seg_plan[~ok] = None
                plan[lo:hi] = seg_plan
                seg_score = sc[safe].astype(np.float64)
                seg_score[~ok] = np.nan
                score[lo:hi] = seg_score
            out["plan"] = plan
            out["score"] = score
        if cfg is not None:
            picked = _searchsorted_pick(cfg[0], cfg[1], ts_us)
            for c, v in picked.items():
                out[c] = v
        return out

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_conv = pdf["conv_id"].iloc[-1]
            tail = (pdf["conv_id"] == last_conv).to_numpy()
            carry = pdf[tail]
            head = pdf[~tail]
            if len(head):
                yield process(head)
        if carry is not None and len(carry):
            yield process(carry)

    out = prep.mapInPandas(gen, schema)
    if fallback_profile is not None:
        from nuclei_feature_extraction_spark.operators.asof import asof_join

        out = asof_join(
            out, fallback_profile, on="conv_id", left_ts="ts",
            right_ts="effective_ts", tie_cols=("plan",),
        )
    if fallback_config is not None:
        from nuclei_feature_extraction_spark.operators.asof import asof_join

        # keyless side too big to broadcast: constant-key union-window
        out = out.withColumn("__k", F.lit(1))
        out = asof_join(
            out, fallback_config.withColumn("__k", F.lit(1)), on="__k",
            left_ts="ts", right_ts="effective_ts",
        ).drop("__k")
    return out
