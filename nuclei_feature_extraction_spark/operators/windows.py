"""Lag/lead + rolling window feature builders.

All frames END at the current row (zero temporal leakage — the engine's
core invariant; SURVEY.md §2.5). The single deliberate exception,
``lead``, is quarantined under a ``future_`` name prefix and excluded
from the verified feature vector (plans/leakage.py enforces both).

Analog map to the reference kernels (SURVEY.md §2.4):
- rolling masked mean/std  ← masked color stats, /root/reference/src/features/color.rs:117-134
- circular time-of-day mean ← circular hue mean, /root/reference/src/features/color.rs:144-155
- multi-scale rolling bank  ← Gabor bank mean/var, /root/reference/src/features/texture.rs:319-344

Everything here is built-in Catalyst expressions — whole-stage codegen,
no Python in the hot path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from nuclei_feature_extraction_spark.functions.timeutil import epoch_long, epoch_seconds

FUTURE_PREFIX = "future_"


def conv_window(
    conv_col: str = "conv_id", order_cols: Sequence[str] = ("ts", "turn_idx")
) -> WindowSpec:
    return Window.partitionBy(conv_col).orderBy(*order_cols)


def with_lag_lead(
    df: DataFrame,
    cols: Sequence[str],
    lags: Sequence[int] = (1, 2, 3),
    leads: Sequence[int] = (),
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("ts", "turn_idx"),
) -> DataFrame:
    """lag_k (past, verified) and future_lead_k (quarantined) columns."""
    w = conv_window(conv_col, order_cols)
    out: list[Column] = [F.col("*")]
    for c in cols:
        for k in lags:
            out.append(F.lag(c, k).over(w).alias(f"{c}_lag{k}"))
        for k in leads:
            out.append(F.lead(c, k).over(w).alias(f"{FUTURE_PREFIX}{c}_lead{k}"))
    return df.select(*out)


_AGGS = {
    "mean": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "std": F.stddev_pop,  # population std, /N — matches color.rs:123-128 biased std
    "count": F.count,
}


def _frame(w: WindowSpec, *, rows: int | None, seconds: float | None) -> WindowSpec:
    if (rows is None) == (seconds is None):
        raise ValueError("exactly one of rows= / seconds= required")
    if rows is not None:
        if rows <= 0:
            raise ValueError("rows frame must be positive")
        return w.rowsBetween(-(rows - 1), Window.currentRow)
    return w.rangeBetween(-int(seconds), Window.currentRow)


def with_rolling(
    df: DataFrame,
    col: str,
    stats: Sequence[str] = ("mean", "std", "min", "max"),
    rows: int | None = None,
    seconds: float | None = None,
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("ts", "turn_idx"),
    ts_col: str = "ts",
    prefix: str | None = None,
) -> DataFrame:
    """Rolling stats over a trailing rows- or time-range frame.

    Range frames order by epoch seconds (``ts.cast(long)``) because
    rangeBetween needs a numeric ordering key. Frame lower bound is
    ``-(rows-1)`` / ``-seconds`` … CURRENT ROW: leakage-free.
    """
    if rows is not None:
        w = _frame(conv_window(conv_col, order_cols), rows=rows, seconds=None)
        tag = f"r{rows}"
    else:
        w = _frame(
            Window.partitionBy(conv_col).orderBy(epoch_long(ts_col)),
            rows=None,
            seconds=seconds,
        )
        tag = f"s{int(seconds)}"
    prefix = prefix or f"{col}_{tag}"
    out = df
    for s in stats:
        out = out.withColumn(f"{prefix}_{s}", _AGGS[s](col).over(w))
    return out


def with_masked_rolling(
    df: DataFrame,
    col: str,
    mask: Column,
    mask_name: str,
    stats: Sequence[str] = ("mean", "std"),
    rows: int = 50,
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("ts", "turn_idx"),
) -> DataFrame:
    """Masked rolling stats: analog of the reference's masked mean/std
    (Σ(x·mask)/Σmask — color.rs:117-134), via ``when(mask, x)`` so the
    built-in aggregate skips non-mask rows (nulls)."""
    w = _frame(conv_window(conv_col, order_cols), rows=rows, seconds=None)
    masked = F.when(mask, F.col(col))
    out = df
    for s in stats:
        out = out.withColumn(
            f"{col}_{mask_name}_r{rows}_{s}", _AGGS[s](masked).over(w)
        )
    return out


def with_circular_time_mean(
    df: DataFrame,
    rows: int = 50,
    ts_col: str = "ts",
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("ts", "turn_idx"),
    out_col: str | None = None,
) -> DataFrame:
    """Circular mean of time-of-day (degrees, [0, 360)) over a trailing
    frame: ``atan2(mean sin, mean cos)`` then wrap — the exact trig
    composition of the reference's circular hue mean
    (/root/reference/src/features/color.rs:144-155)."""
    w = _frame(conv_window(conv_col, order_cols), rows=rows, seconds=None)
    sec_of_day = epoch_seconds(ts_col) % F.lit(86400.0)
    theta = sec_of_day / F.lit(86400.0) * F.lit(2.0 * 3.141592653589793)
    mean_sin = F.avg(F.sin(theta)).over(w)
    mean_cos = F.avg(F.cos(theta)).over(w)
    deg = F.degrees(F.atan2(mean_sin, mean_cos))
    wrapped = (deg + F.lit(360.0)) % F.lit(360.0)
    return df.withColumn(out_col or f"tod_circmean_r{rows}", wrapped)


def multi_scale_rolling_bank(
    df: DataFrame,
    col: str,
    windows: Sequence[int] = (4, 8, 16, 32, 64, 128),
    stats: Sequence[str] = ("mean", "std"),
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("ts", "turn_idx"),
) -> DataFrame:
    """Scale-only rolling bank: one mean/std pair per trailing window
    size (the DC component of the Gabor analog; see
    ``gabor_rolling_bank`` for the full scale × phase grid)."""
    w0 = conv_window(conv_col, order_cols)
    out: list[Column] = [F.col("*")]
    for win in windows:
        w = w0.rowsBetween(-(win - 1), Window.currentRow)
        for s in stats:
            out.append(_AGGS[s](col).over(w).alias(f"{col}_bank_w{win}_{s}"))
    return df.select(*out)


TWO_PI = 2.0 * 3.141592653589793


def gabor_rolling_bank(
    df: DataFrame,
    col: str,
    windows: Sequence[int] = (4, 8, 16, 32, 64, 128),
    n_phases: int = 4,
    stats: Sequence[str] = ("mean", "std"),
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("ts", "turn_idx"),
    pos_col: str | None = None,
) -> DataFrame:
    """Gabor-bank analog with the full parameter grid
    (texture.rs:319-361): the reference convolves a patch with
    8 orientations × 6 frequencies and reports masked mean+variance per
    filter. The 1-D transcript analog modulates the signal with a
    cosine carrier — one cycle per window (wavelength = scale) at
    ``n_phases`` phase offsets φ_p = p·π/n_phases — and takes trailing
    mean/std per (scale, phase):

        response_{w,p}(t) = stat_{i ∈ last w rows} cos(2π·pos_i/w + φ_p)·x_i

    Phases cover [0, π): in 1-D a π shift is a sign flip (mean negates,
    std unchanged), so the reference's 8 orientations collapse to 4
    non-redundant phases; pass n_phases=8 to mirror the reference grid
    literally. Columns: ``{col}_gabor_w{w}_p{p}_{stat}``.

    Plan shape: ONE row_number pass + all modulated aggregates share
    the same window sort — a single exchange, no Python.
    """
    w0 = conv_window(conv_col, order_cols)
    if pos_col is None:
        pos_col = "__gabor_pos"
        df = df.withColumn(pos_col, F.row_number().over(w0) - F.lit(1))
        drop_pos = True
    else:
        drop_pos = False
    out: list[Column] = [F.col("*")]
    for win in windows:
        w = w0.rowsBetween(-(win - 1), Window.currentRow)
        omega = TWO_PI / win
        for p in range(n_phases):
            phi = p * 3.141592653589793 / n_phases
            carrier = F.cos(F.col(pos_col) * F.lit(omega) + F.lit(phi))
            m = carrier * F.col(col)
            for s in stats:
                out.append(
                    _AGGS[s](m).over(w).alias(f"{col}_gabor_w{win}_p{p}_{s}")
                )
    res = df.select(*out)
    return res.drop(pos_col) if drop_pos else res


def circular_recentered_std(
    df: DataFrame,
    group_col: str = "conv_id",
    ts_col: str = "ts",
    prefix: str = "tod",
) -> DataFrame:
    """Recenter-then-std for a circular signal (A3, color.rs:50-53: the
    reference recenters hue by its circular mean, then takes the linear
    std of the recentered values). Per group: circular mean μ of the
    time-of-day angle, then the population std of the wrapped deviation
    ((θ − μ + π) mod 2π) − π.

    Plan: two unordered window aggregates over the SAME partitioning —
    one shuffle on the group key, no sort (whole-partition frames).
    Appends ``{prefix}_circmean_deg`` and ``{prefix}_recentered_std_deg``.
    """
    w = Window.partitionBy(group_col)
    theta = (
        epoch_seconds(ts_col) % F.lit(86400.0)
    ) / F.lit(86400.0) * F.lit(TWO_PI)
    mu = F.atan2(F.avg(F.sin(theta)).over(w), F.avg(F.cos(theta)).over(w))
    pi = 3.141592653589793
    dev = F.pmod(theta - mu + F.lit(pi), F.lit(TWO_PI)) - F.lit(pi)
    out = df.withColumn("__dev", dev).withColumn(
        f"{prefix}_circmean_deg",
        (F.degrees(mu) + F.lit(360.0)) % F.lit(360.0),
    )
    w2 = Window.partitionBy(group_col)
    return out.withColumn(
        f"{prefix}_recentered_std_deg",
        F.degrees(F.stddev_pop("__dev").over(w2)),
    ).drop("__dev")
