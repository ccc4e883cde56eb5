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
    pdf: pd.DataFrame, gap_minutes: float = 30.0, pos_offset: int = 0
) -> pd.DataFrame:
    """All window-family features over a sorted multi-conversation chunk,
    numerically equal (1e-9) to the Catalyst expressions in
    operators/windows.py (pinned by test_fused.py).

    Trailing mean/std for EVERY (signal, window) pair come from ONE
    segmented cumsum pass over a single (n, k) block — rolling sum =
    csum[i] − csum[i−w] within the segment — instead of one pandas
    rolling call per stat (38 C passes + block consolidation dominated
    the round-1 profile: 17s → ~2s per 1M rows). Error stays bounded by
    the per-segment partial sums (groupby cumsum restarts per
    conversation, so nothing leaks across segments). Only min/max keep
    the pandas rolling deque (no cumsum identity exists)."""
    conv, _ = pd.factorize(pdf["conv_id"].to_numpy(), sort=False)
    n = len(pdf)
    first = np.empty(n, dtype=bool)
    first[0] = True
    first[1:] = conv[1:] != conv[:-1]
    # pos_offset: ABSOLUTE position of row 0 within its conversation —
    # used by the streaming path, whose frame is a single conversation's
    # carried tail + new rows (position-dependent terms: gabor carriers,
    # window-fill counts, lag validity). Batch chunks pass 0.
    pos = _seg_pos(first) + pos_offset
    seg = np.cumsum(first)

    tlen = pdf["tlen"].to_numpy(dtype=np.float64)
    # role may arrive CATEGORICAL (the Arrow fused backend dictionary-
    # encodes it so strings never box into Python objects); lags are
    # then computed on the int8 codes and emitted as Categoricals with
    # the same categories — value-identical after decode.
    role_cat: pd.Categorical | None = None
    if isinstance(pdf["role"].dtype, pd.CategoricalDtype):
        role_cat = pdf["role"].array
        role_codes = role_cat.codes.astype(np.int64, copy=False)
        try:
            asst_code = role_cat.categories.get_loc("assistant")
        except KeyError:
            asst_code = -2
    else:
        role = pdf["role"].to_numpy()
    us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
    sec = us / 1e6

    out: dict[str, np.ndarray] = {}
    # sessionize: strictly greater than the cutoff splits. Compared in
    # INTEGER microseconds (µs values < 2^53 are exact in float64), the
    # same tree as the batch sessionize operator and the streaming
    # stateful sessionizer — the previous divide-by-1e6-then-subtract
    # form could drift ~1e-7 s and flip a row sitting exactly on the
    # 30-min boundary.
    prev_us = _seg_shift_f(us.astype(np.float64), pos, 1)
    new_sess = (~np.isnan(prev_us)) & (
        (us - prev_us) > gap_minutes * 60.0 * 1e6
    )
    out["session_id"] = _seg_cumsum(new_sess.astype(np.float64), first).astype(
        np.int32
    )
    role_lags: dict[str, object] = {}
    for k in (1, 2, 3):
        out[f"tlen_lag{k}"] = _seg_shift_f(tlen, pos, k)
        if role_cat is not None:
            lagged = _seg_shift_f(role_codes.astype(np.float64), pos, k)
            lag_codes = np.where(np.isnan(lagged), -1, lagged).astype(np.int64)
            role_lags[f"role_lag{k}"] = pd.Categorical.from_codes(
                lag_codes, categories=role_cat.categories
            )
        else:
            role_lags[f"role_lag{k}"] = _seg_shift_obj(role, pos, k)

    theta = (sec % 86400.0) / 86400.0 * TWO_PI
    is_asst = (
        role_codes == asst_code if role_cat is not None else role == "assistant"
    )
    masked0 = np.where(is_asst, tlen, 0.0)  # NaN-as-0 + separate count

    # ---- one cumsum block of every moment needed ----------------------
    # Gabor phases never materialize: with I = Σcos(ωj)x, Q = Σsin(ωj)x
    # (and the 3 second moments a², ab, b²), every phase is a scalar
    # linear combination — 5 cumsum columns per window instead of 8.
    cols: list[np.ndarray] = [
        tlen, tlen * tlen, masked0, masked0 * masked0,
        is_asst.astype(np.float64), np.sin(theta), np.cos(theta),
    ]
    names = ["t1", "t2", "m1", "m2", "mc", "sin", "cos"]
    for w in GABOR_WINDOWS:
        omega = TWO_PI / w
        cw = np.cos(pos * omega)
        sw = np.sin(pos * omega)
        a = cw * tlen
        b = sw * tlen
        cols += [a, b, a * a, a * b, b * b]
        names += [f"a1_{w}", f"b1_{w}", f"aa_{w}", f"ab_{w}", f"bb_{w}"]
    k = len(cols)
    block = np.empty((n, k))
    for j, c in enumerate(cols):
        block[:, j] = c
    # global cumsum + per-segment offset: for pos ≥ w both rolling-sum
    # terms share the segment offset, so it cancels — one gather, no
    # groupby machinery. Chunk-bounded partial sums keep fp error far
    # under the 1e-9 parity tolerance (chunks are Arrow-batch sized).
    C = np.cumsum(block, axis=0)
    rows = np.arange(n)
    seg_start = np.maximum.accumulate(np.where(first, rows, 0))
    offs = C[np.maximum(seg_start - 1, 0)]
    offs[seg_start == 0] = 0.0
    jix = {nm: j for j, nm in enumerate(names)}
    _wcache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def wnd(w: int):
        if w not in _wcache:
            _wcache[w] = (np.maximum(rows - w, 0), pos >= w)
        return _wcache[w]

    def wsum(nm: str, w: int) -> np.ndarray:
        j = jix[nm]
        idx, full = wnd(w)
        return C[:, j] - np.where(full, C[idx, j], offs[:, j])

    cntc: dict[int, np.ndarray] = {}

    def cnt(w: int) -> np.ndarray:
        if w not in cntc:
            cntc[w] = np.minimum(pos + 1, w).astype(np.float64)
        return cntc[w]

    def _var_floor(v: np.ndarray, e2: np.ndarray) -> np.ndarray:
        # E[x²]−m² cancellation noise is ~eps·E[x²]; a variance below
        # that floor is indistinguishable from 0 (a constant window) —
        # zero it so sqrt doesn't inflate noise to ~1e-6 (the n=1 case)
        return np.where(v < 1e-11 * np.abs(e2), 0.0, v)

    def mean_std(nm1: str, nm2: str, w: int, c: np.ndarray | None = None):
        c = cnt(w) if c is None else c
        with np.errstate(divide="ignore", invalid="ignore"):
            m = np.where(c > 0, wsum(nm1, w) / c, np.nan)
            e2 = wsum(nm2, w) / c
            v = np.where(c > 0, _var_floor(e2 - m * m, e2), np.nan)
        return m, np.sqrt(np.clip(v, 0.0, None))

    m, s = mean_std("t1", "t2", 20)
    out["tlen_r20_mean"], out["tlen_r20_std"] = m, s
    m, s = mean_std("m1", "m2", 20, c=wsum("mc", 20))
    out["tlen_asst_r20_mean"], out["tlen_asst_r20_std"] = m, s
    ms = wsum("sin", 20) / cnt(20)
    mc = wsum("cos", 20) / cnt(20)
    out["tod_circmean_r20"] = (np.degrees(np.arctan2(ms, mc)) + 360.0) % 360.0
    for w in (4, 16, 64):
        m, s = mean_std("t1", "t2", w)
        out[f"tlen_bank_w{w}_mean"], out[f"tlen_bank_w{w}_std"] = m, s
    for w in GABOR_WINDOWS:
        c = cnt(w)
        with np.errstate(divide="ignore", invalid="ignore"):
            mi, mq = wsum(f"a1_{w}", w) / c, wsum(f"b1_{w}", w) / c
            eaa, eab, ebb = (
                wsum(f"aa_{w}", w) / c,
                wsum(f"ab_{w}", w) / c,
                wsum(f"bb_{w}", w) / c,
            )
        for p in range(GABOR_PHASES):
            phi = p * 3.141592653589793 / GABOR_PHASES
            cp, sp = np.cos(phi), np.sin(phi)
            m = cp * mi - sp * mq
            e2 = cp * cp * eaa - 2 * cp * sp * eab + sp * sp * ebb
            out[f"tlen_gabor_w{w}_p{p}_mean"] = m
            out[f"tlen_gabor_w{w}_p{p}_std"] = np.sqrt(
                np.clip(_var_floor(e2 - m * m, e2), 0.0, None)
            )

    # min/max: no cumsum identity — pandas' O(n) monotonic deque
    gt = pd.Series(tlen).groupby(seg, sort=False).rolling(20, min_periods=1)
    out["tlen_r20_min"] = gt.min().to_numpy()
    out["tlen_r20_max"] = gt.max().to_numpy()

    # single-block assembly (no per-column consolidation)
    float_names = [nm for nm in out if out[nm].dtype.kind == "f"]
    fblock = np.empty((len(float_names), n))
    for i, nm in enumerate(float_names):
        fblock[i] = out[nm]
    res = pd.DataFrame(
        fblock.T, columns=float_names, index=pdf.index, copy=False
    )
    res["session_id"] = out["session_id"]
    for k in (1, 2, 3):
        res[f"role_lag{k}"] = role_lags[f"role_lag{k}"]
    return res


def _asof_arrays(
    side: pd.DataFrame, ts_col: str, tie_cols: Sequence[str], value_cols: Sequence[str]
):
    """Sorted flat arrays for the broadcast as-of. String-typed value
    columns are stored as (codes, categories) — integer codes broadcast
    smaller and, in the Arrow backend, decode C-side into the output
    batch so no per-row Python string is ever built."""
    side = side.sort_values([ts_col, *tie_cols], kind="mergesort")
    rts = side[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
    vals: dict[str, tuple] = {}
    for c in value_cols:
        arr = side[c].to_numpy()
        if arr.dtype.kind == "O":
            codes, cats = pd.factorize(side[c], sort=False)
            vals[c] = ("cat", codes.astype(np.int64), cats.to_numpy(dtype=object))
        else:
            vals[c] = ("num", arr)
    return rts, vals


def _searchsorted_pick(
    rts: np.ndarray, vals: dict[str, tuple], ts_us: np.ndarray
) -> dict[str, tuple]:
    """Rightmost side row with rts <= ts per output row. Returns, per
    column, ("num", ndarray) or ("cat", codes, cats) with -1 = no match
    — the caller decodes per backend (object decode for the pandas
    path, dictionary decode for the Arrow path)."""
    idx = np.searchsorted(rts, ts_us, side="right") - 1
    ok = idx >= 0
    safe = np.clip(idx, 0, None)
    out: dict[str, tuple] = {}
    for c, spec in vals.items():
        if spec[0] == "num":
            arr = spec[1]
            if arr.dtype.kind == "f":
                v = arr[safe].astype(np.float64)
                v[~ok] = np.nan
                out[c] = ("num", v)
            else:
                v = arr[safe].astype(object)
                v[~ok] = None
                out[c] = ("num", v)
        else:
            _, codes, cats = spec
            p = codes[safe].copy()
            p[~ok] = -1
            out[c] = ("cat", p, cats)
    return out


def _decode_cat_object(codes: np.ndarray, cats: np.ndarray) -> np.ndarray:
    """(codes, cats) -> object ndarray with None for -1 (the exact
    value layout the pandas serializer shipped before coding)."""
    v = np.empty(len(codes), dtype=object)
    m = codes >= 0
    v[m] = cats[codes[m]]
    v[~m] = None
    return v


KERNEL_TIMER_FAMILIES = (
    "cooc", "runlen", "xcooc", "shape", "window", "sidelookup",
)


def kernel_timing_accumulators(spark) -> dict:
    """One float Spark accumulator per kernel family. Pass the dict as
    ``build_features_fused(..., kernel_timers=...)``; after the action,
    ``{f: acc.value}`` is the cluster-wide CPU-seconds per family (sum
    over tasks — divide by executor cores for wall share). Lets a run
    manifest expose e.g. the documented hull/shape share per-run.

    AT-LEAST-ONCE semantics: the adds happen inside a mapInPandas
    TRANSFORMATION, where Spark only guarantees at-least-once execution
    — task retries, speculative duplicates, and plan-branch
    recomputation each add their CPU time again. The numbers are a
    regression TRIPWIRE, not an exact meter: before reading a jump as a
    kernel regression, check the run for task failures/retries (the
    manifests record the caveat alongside the values)."""
    sc = spark.sparkContext
    return {f: sc.accumulator(0.0) for f in KERNEL_TIMER_FAMILIES}


def build_features_fused(
    df: DataFrame,
    side_profile: DataFrame | None = None,
    side_config: DataFrame | None = None,
    lags: Sequence[int] = DEFAULT_LAGS,
    levels: Sequence[int] = DEFAULT_LEVELS,
    gap_minutes: float = 30.0,
    num_partitions: int | None = None,
    max_broadcast_side_rows: int = 2_000_000,
    kernel_timers: dict | None = None,
    backend: str = "arrow",
) -> DataFrame:
    """Single-shuffle full feature vector; column-compatible with
    ``build_features(df, ["all"], side_profile, side_config)``.

    ``backend='arrow'`` (default) runs the kernel pass as ``mapInArrow``:
    strings never box into Python objects (conv_id/role dictionary-
    encode C-side, text/tool pass through zero-copy, string outputs
    decode from dictionary codes C-side). ``backend='pandas'`` keeps the
    original ``mapInPandas`` formulation — value-identical output,
    pinned by tests/test_fused.py.

    Side tables within ``max_broadcast_side_rows`` ride into the kernel
    as driver-built broadcast arrays (four flat numpy arrays sorted by
    (conv, ts) — 2M rows ≈ ~100 MB on the driver, hence the guard). A
    LARGER side table automatically falls back to the composable
    union-window as-of applied AFTER the fused pass: the features
    themselves still take exactly one narrow shuffle; only the as-of
    merge adds its own key-shuffle. The row count is checked with a
    cheap ``count()`` BEFORE any driver materialization.

    ``kernel_timers``: optional dict of Spark float accumulators (see
    :func:`kernel_timing_accumulators`) — each Arrow task adds its
    per-family kernel seconds (cooc/runlen/xcooc/shape + window +
    sidelookup), so the run manifest can report the family share of
    every run instead of leaving regressions to per-investigation
    profiling. Accumulator updates ride task completion — works
    identically on a real cluster."""
    spark = df.sparkSession

    def _too_big(side: DataFrame) -> bool:
        # limit(n+1).count() early-exits the scan after n+1 rows — a
        # full count() of a big side table costs a whole job just to
        # learn "too big"
        return (
            side.limit(max_broadcast_side_rows + 1).count()
            > max_broadcast_side_rows
        )

    fallback_profile = None
    if side_profile is not None and _too_big(side_profile):
        fallback_profile = side_profile
        side_profile = None
    fallback_config = None
    if side_config is not None and _too_big(side_config):
        fallback_config = side_config
        side_config = None

    profile_arrays = None
    if side_profile is not None:
        # flat sorted arrays + searchsorted slicing, NOT a per-conv dict:
        # a dict of 10^5+ conversations costs seconds of driver-side
        # Python to build and pickles as 10^5 objects; four numpy arrays
        # build in ~ms and broadcast as buffers. Sort by (conv, ts, plan)
        # keeps within-conv ts order and the greatest-plan tie-break.
        ppd = side_profile.toPandas().sort_values(
            ["conv_id", "effective_ts", "plan"], kind="mergesort"
        )
        plan_codes, plan_cats = pd.factorize(ppd["plan"], sort=False)
        profile_arrays = (
            ppd["conv_id"].to_numpy(dtype="U"),
            ppd["effective_ts"].to_numpy(dtype="datetime64[us]").astype(np.int64),
            plan_codes.astype(np.int64),
            np.asarray(plan_cats, dtype=object),
            ppd["score"].to_numpy(dtype=np.float64),
        )
    cfg_arrays = None
    if side_config is not None:
        cpd = side_config.toPandas()
        cfg_arrays = _asof_arrays(
            cpd, "effective_ts", (), [c for c in cpd.columns if c != "effective_ts"]
        )
    bc = spark.sparkContext.broadcast((profile_arrays, cfg_arrays))

    kcols = feature_names(("cooc", "runlen", "xcooc", "shape"), lags, levels)
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

    def process(chunk: pd.DataFrame, conv_ids=None) -> pd.DataFrame:
        import time as _time

        prof, cfg = bc.value
        # Arrow backend marker: role arrives dictionary-encoded, so the
        # string-valued side picks stay coded too and decode C-side
        coded = isinstance(chunk["role"].dtype, pd.CategoricalDtype)
        tm: dict | None = {} if kernel_timers is not None else None
        base = compute_features_pdf(
            chunk, ("cooc", "runlen", "xcooc", "shape"), lags, levels,
            passthrough=True, assume_sorted=True, timings=tm,
        )
        _t0 = _time.perf_counter()
        win = _window_features_pdf(base, gap_minutes)
        if tm is not None:
            tm["window"] = _time.perf_counter() - _t0
            _t0 = _time.perf_counter()
        # column-wise adoption instead of pd.concat(axis=1): concat
        # consolidates the two frames' float blocks (a full-width
        # memcpy); per-column assignment just appends block refs
        out = base
        for c in win.columns:
            out[c] = win[c].values
        ts_us = out["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        if prof is not None:
            pconv, prts, ppl_codes, ppl_cats, psc = prof
            conv_arr = out["conv_id"].to_numpy()
            # per-CONVERSATION string searches (one per conv, repeated to
            # rows), then one fully VECTORIZED bounded binary search for
            # the rightmost side row with rts ≤ ts inside each conv's
            # side block — ~log2(max block) numpy passes, zero Python
            # per-row/per-conv work (the round-2 per-conversation loop
            # pinned one core on many-conversation chunks)
            starts = np.flatnonzero(np.r_[True, conv_arr[1:] != conv_arr[:-1]])
            counts = np.diff(np.r_[starts, len(out)])
            # natural-width str, NOT pconv.dtype: casting to the profile's
            # fixed '<U' width would truncate longer out-of-profile ids to
            # a prefix that can falsely match a profile id
            cids = (
                conv_ids(starts) if conv_ids is not None
                else conv_arr[starts].astype(str)
            )
            blo = np.repeat(np.searchsorted(pconv, cids, side="left"), counts)
            bhi = np.repeat(np.searchsorted(pconv, cids, side="right"), counts)
            lo, hi = blo.copy(), bhi.copy()
            while True:
                active = lo < hi
                if not active.any():
                    break
                mid = (lo + hi) >> 1
                le = np.zeros(len(lo), dtype=bool)
                am = mid[active]
                le[active] = prts[am] <= ts_us[active]
                lo = np.where(active & le, mid + 1, lo)
                hi = np.where(active & ~le, mid, hi)
            idx = lo - 1
            ok = idx >= blo  # empty block (blo == bhi) → idx < blo
            safe = np.clip(idx, 0, None)
            pick = ppl_codes[safe].copy()
            pick[~ok] = -1
            score = psc[safe].astype(np.float64)
            score[~ok] = np.nan
            if coded:
                out["plan"] = pd.Categorical.from_codes(
                    pick, categories=pd.Index(ppl_cats)
                )
            else:
                out["plan"] = _decode_cat_object(pick, ppl_cats)
            out["score"] = score
        if cfg is not None:
            picked = _searchsorted_pick(cfg[0], cfg[1], ts_us)
            for c, spec in picked.items():
                if spec[0] == "num":
                    out[c] = spec[1]
                elif coded:
                    out[c] = pd.Categorical.from_codes(
                        spec[1], categories=pd.Index(spec[2])
                    )
                else:
                    out[c] = _decode_cat_object(spec[1], spec[2])
        if tm is not None:
            tm["sidelookup"] = _time.perf_counter() - _t0
            for fam, secs in tm.items():
                acc = kernel_timers.get(fam)
                if acc is not None:
                    acc.add(secs)
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

    out_names = [f.name for f in fields]
    passthrough_names = set(df.columns) | {"tlen"}

    def gen_arrow(batches):
        """Arrow-native twin of ``gen`` (guide §4): the six narrow input
        columns cross the boundary ONCE as Arrow buffers; conv_id/role
        are dictionary-encoded (C-side) instead of boxed into Python
        strings; text/tool pass through into the output batch ZERO-COPY
        without ever becoming Python objects; string outputs (role lags,
        side picks) are built as dictionary codes and decoded C-side.
        Value-identical to the pandas backend (pinned by test)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        def to_arrow_col(v: pd.Series):
            if isinstance(v.dtype, pd.CategoricalDtype):
                cat = v.array
                codes = np.asarray(cat.codes)
                ind = pa.array(codes.astype(np.int32), mask=codes < 0)
                da = pa.DictionaryArray.from_arrays(
                    ind,
                    pa.array(
                        np.asarray(cat.categories, dtype=object),
                        type=pa.string(),
                    ),
                )
                return da.dictionary_decode()
            npv = v.to_numpy()
            if npv.dtype.kind in "fO":
                # from_pandas=True masks NaN/None → null, matching the
                # pandas serializer's float handling exactly
                return pa.array(npv, from_pandas=True)
            return pa.array(npv)

        def emit(tbl: "pa.Table") -> "pa.RecordBatch":
            tbl = tbl.combine_chunks()
            col = {nm: tbl.column(nm).chunk(0) for nm in tbl.column_names}
            conv_pa = col["conv_id"]
            conv_codes = pc.dictionary_encode(conv_pa).indices.to_numpy(
                zero_copy_only=False
            ).astype(np.int64, copy=False)
            rd = pc.dictionary_encode(col["role"])
            r_ind = rd.indices
            if r_ind.null_count:
                r_ind = r_ind.fill_null(-1)
            role_cat = pd.Categorical.from_codes(
                r_ind.to_numpy(zero_copy_only=False),
                categories=rd.dictionary.to_pylist(),
            )
            tool_isnull = col["tool"].is_null().to_numpy(zero_copy_only=False)
            chunk = pd.DataFrame(
                {
                    "conv_id": conv_codes,
                    "turn_idx": col["turn_idx"].to_numpy(zero_copy_only=False),
                    "role": role_cat,
                    "tool": np.where(tool_isnull, np.nan, 0.0),
                    "ts": col["ts"].to_numpy(zero_copy_only=False),
                    "tlen": col["tlen"].to_numpy(zero_copy_only=False),
                }
            )

            def conv_ids(starts: np.ndarray) -> np.ndarray:
                return np.asarray(
                    conv_pa.take(pa.array(starts)).to_pylist(), dtype=str
                )

            out_pdf = process(chunk, conv_ids=conv_ids)
            arrays = [
                col[nm] if nm in passthrough_names else to_arrow_col(out_pdf[nm])
                for nm in out_names
            ]
            return pa.RecordBatch.from_arrays(arrays, names=out_names)

        carry = None
        for b in batches:
            tbl = pa.Table.from_batches([b])
            if carry is not None and carry.num_rows:
                tbl = pa.concat_tables([carry, tbl])
            if tbl.num_rows == 0:
                continue
            conv = tbl.column("conv_id")
            n_tail = pc.sum(pc.equal(conv, conv[-1])).as_py()
            head = tbl.slice(0, tbl.num_rows - n_tail)
            carry = tbl.slice(tbl.num_rows - n_tail).combine_chunks()
            if head.num_rows:
                yield emit(head)
        if carry is not None and carry.num_rows:
            yield emit(carry)

    if backend == "arrow":
        # mapInArrow hands the worker RAW UTC-epoch timestamps, while
        # the driver-built side arrays come from toPandas() (session-tz
        # naive). The repo pins the session to UTC (get_spark), where
        # the two representations coincide; under any other session tz
        # the as-of searchsorted would compare skewed clocks — fall
        # back to the pandas backend, which converts both sides with
        # the same session tz.
        tz = spark.conf.get("spark.sql.session.timeZone", "")
        if tz not in ("UTC", "Etc/UTC", "GMT"):
            out = prep.mapInPandas(gen, schema)
        else:
            out = prep.mapInArrow(gen_arrow, schema)
    elif backend == "pandas":
        out = prep.mapInPandas(gen, schema)
    else:
        raise ValueError(f"backend must be 'arrow' or 'pandas', got {backend!r}")
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
