"""STREAMING prefix kernel features — the flagship's co-occurrence and
shape families maintained incrementally per conversation with
``applyInPandasWithState`` (SURVEY §2.7: custom stateful operators for
live transcript feeds).

The batch kernels express prefix stats as segmented cumsums over whole
sorted conversations; a stream sees a conversation in arbitrary
micro-batch slices, so here the SUFFICIENT STATISTICS live in the group
state instead — and both families need only FIXED-SIZE state:

- cooc (lag 1, K=4): the symmetric K×K transition-count matrix (16
  longs) + the previous level. Every Haralick stat is a closed-form
  function of that matrix, so each arriving turn is one O(K²) numpy
  evaluation — no history kept.
- shape: the 2-D moment sums (n, Σu, Σy, Σu², Σy², Σuy), the path
  length, the running u/y extents, the conversation anchor timestamp,
  and the previous point. PCA axes/angle/eccentricity, span area and
  compacity are closed-form in those.

Emitted values match the batch ``prefix_features`` output column for
column (pinned by tests/test_streaming_stateful.py across a replay that
splits conversations mid-stream) — the batch path computes the same
mathematics via incremental identities, so agreement is allclose, not
bitwise.

Rows inside a micro-batch are sorted by (ts, turn_idx); correctness
across micro-batches requires per-conversation event-time monotonicity
between batches (append-only transcript logs replayed in order)."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from nuclei_feature_extraction_spark.functions.kernels import ROLE_IDX
from nuclei_feature_extraction_spark.functions.oracle import discretize_log

K = 4
KA = 5  # role levels (4 named + other)

COOC_OUT = [
    "correlation", "contrast", "dissimilarity", "entropy", "asm",
    "sum_average", "sum_variance", "sum_entropy", "sum_of_squares",
    "idm", "difference_average", "difference_variance", "imc1", "imc2",
]
SHAPE_OUT = [
    "pca_major", "pca_minor", "pca_angle", "pca_eccentricity",
    "path_len", "span_area", "compacity",
]
XCOOC_OUT = [
    "contrast", "dissimilarity", "mean_a", "mean_b", "correlation",
    "asm", "entropy", "hx", "hy", "mi",
]
RUNLEN_OUT = [
    "n_runs", "rp", "mean_len", "sre", "lre", "rlvar", "gln", "lgre",
    "hgre", "rln", "srlge", "srhge", "srmge", "srege", "lrlge", "lrhge",
    "lrmge", "lrege",
]
RUNLEN_SIGS = (("role", 5), ("has_tool", 2), ("tlen4", 4), ("posb", 4))
# per-signal scalar state layout: r, cur_lev, cur_len, then the 14
# accumulators, then G per-level run-start counts
_RL_ACC = 14

OUT_SCHEMA = (
    "conv_id string, turn_idx int, ts timestamp, "
    + ", ".join(f"cooc_{s}_d1_k4 double" for s in COOC_OUT)
    + ", "
    + ", ".join(f"shape_{s} double" for s in SHAPE_OUT)
    + ", "
    + ", ".join(f"xcooc_{s}_d1 double" for s in XCOOC_OUT)
    + ", "
    + ", ".join(
        f"runlen_{st}_{sig} double" for sig, _ in RUNLEN_SIGS
        for st in RUNLEN_OUT
    )
)
STATE_SCHEMA = (
    "counts array<long>, prev_lev int, n long, su double, sy double, "
    "suu double, syy double, suy double, path double, "
    "umin double, umax double, ymin double, ymax double, "
    "t0_us long, prev_u double, prev_y double, "
    "xcounts array<long>, prev_role int, "
    + ", ".join(
        f"rl_{sig} array<double>, rlh_len_{sig} array<long>, "
        f"rlh_cnt_{sig} array<long>"
        for sig, _ in RUNLEN_SIGS
    )
)

_XAI = np.arange(KA, dtype=np.float64)[:, None]  # role axis (rows)
_XBJ = np.arange(K, dtype=np.float64)[None, :]   # level axis (cols)

_IV = np.arange(K, dtype=np.float64)
_IG, _JG = np.meshgrid(_IV, _IV, indexing="ij")
_KSUM = (_IG + _JG).astype(np.int64)
_LDIFF = np.abs(_IG - _JG).astype(np.int64)


def _xlogx(a):
    return np.where(a > 0, a * np.log(np.maximum(a, 1e-300)), 0.0)


def _cooc_stats(c: np.ndarray) -> list[float]:
    """All 14 Haralick stats from the running symmetric count matrix —
    same formulas and degenerate-case guards as the batch kernel
    (kernels.cooc_prefix)."""
    s = c.sum()
    if s <= 0:
        return [np.nan] * len(COOC_OUT)
    p = c / s
    px = p.sum(axis=1)
    mu = float((_IV * px).sum())
    var = float((_IV**2 * px).sum()) - mu * mu
    eij = float((_IG * _JG * p).sum())
    corr = (eij - mu * mu) / var if var > 1e-9 else np.nan
    contrast = float(((_IG - _JG) ** 2 * p).sum())
    dissim = float((np.abs(_IG - _JG) * p).sum())
    entropy = float(-_xlogx(p).sum())
    asm = float((p**2).sum())
    psum = np.bincount(_KSUM.ravel(), weights=p.ravel(), minlength=2 * K - 1)
    kk = np.arange(2 * K - 1, dtype=np.float64)
    sa = float((kk * psum).sum())
    sv = float(((kk - sa) ** 2 * psum).sum())
    se = float(-_xlogx(psum).sum())
    idm = float((p / (1.0 + (_IG - _JG) ** 2)).sum())
    pdiff = np.bincount(_LDIFF.ravel(), weights=p.ravel(), minlength=K)
    ll = np.arange(K, dtype=np.float64)
    da = float((ll * pdiff).sum())
    dv = float(((ll - da) ** 2 * pdiff).sum())
    hx = float(-_xlogx(px).sum())
    imc1 = (entropy - 2 * hx) / hx if hx > 1e-9 else np.nan
    imc2 = float(np.sqrt(max(1.0 - np.exp(-2.0 * (2 * hx - entropy)), 0.0)))
    return [corr, contrast, dissim, entropy, asm, sa, sv, se, var,
            idm, da, dv, imc1, imc2]


def _xcooc_stats(c: np.ndarray) -> list[float]:
    """Cross-signal stats from the running ASYMMETRIC (KA, K) count
    matrix — same formulas/guards as kernels.xcooc_prefix."""
    s = c.sum()
    if s <= 0:
        return [np.nan] * len(XCOOC_OUT)
    p = c / s
    pa = p.sum(axis=1)
    pb = p.sum(axis=0)
    ia = np.arange(KA, dtype=np.float64)
    jb = np.arange(K, dtype=np.float64)
    mean_a = float((ia * pa).sum())
    mean_b = float((jb * pb).sum())
    var_a = float((ia**2 * pa).sum()) - mean_a**2
    var_b = float((jb**2 * pb).sum()) - mean_b**2
    cov = float(((_XAI * _XBJ) * p).sum()) - mean_a * mean_b
    denom = var_a * var_b
    corr = cov / float(np.sqrt(denom)) if denom > 1e-9 else np.nan
    contrast = float(((_XAI - _XBJ) ** 2 * p).sum())
    dissim = float((np.abs(_XAI - _XBJ) * p).sum())
    asm = float((p**2).sum())
    entropy = float(-_xlogx(p).sum())
    hx = float(-_xlogx(pa).sum())
    hy = float(-_xlogx(pb).sum())
    mi = hx + hy - entropy
    return [contrast, dissim, mean_a, mean_b, corr, asm, entropy, hx, hy, mi]


def _runlen_row(st: list, hist: dict, v: int, g: int, np1: int) -> list[float]:
    """Advance ONE signal's run-length state by one row of level ``v``
    and return the 18 GLRLM stats — the streaming twin of the batch
    ``kernels.runlen_prefix`` identities (same per-row deltas, same
    signed dec/inc RLN bookkeeping), with the sufficient statistics as
    scalars + the sparse run-length histogram (distinct lengths are
    O(sqrt(rows)), so state stays tiny)."""
    r = st[0]
    if r == 0.0 or v != int(st[1]):  # new run
        r += 1.0
        st[0] = r
        st[1] = float(v)
        st[2] = 1.0
        rvi = 17 + v
        st[rvi] += 1.0
        st[5] += 2.0 * st[rvi] - 1.0              # gln
        low = 1.0 / (v + 1) ** 2
        high = float((v + 1) ** 2)
        st[6] += low                               # lgre
        st[7] += high                              # hgre
        short_d = 1.0
        long_d = 1.0
        c1 = hist.get(1, 0)
        st[16] += 2.0 * c1 + 1.0                   # rln Σc²: inc bucket 1
        hist[1] = c1 + 1
    else:  # grow cur run
        l = int(st[2]) + 1
        st[2] = float(l)
        short_d = 1.0 / l**2 - 1.0 / (l - 1) ** 2
        long_d = 2.0 * l - 1.0
        low = 1.0 / (v + 1) ** 2
        high = float((v + 1) ** 2)
        cprev = hist.get(l - 1, 0)
        st[16] += -(2.0 * cprev - 1.0)             # dec bucket l−1
        if cprev == 1:
            del hist[l - 1]
        else:
            hist[l - 1] = cprev - 1
        cl = hist.get(l, 0)
        st[16] += 2.0 * cl + 1.0                   # inc bucket l
        hist[l] = cl + 1
    dc = abs(v - (g - 1) / 2.0)
    midw = 1.0 / (dc + 1) ** 2
    extw = (dc + 1) ** 2
    st[3] += short_d                               # sre
    st[4] += long_d                                # lre
    st[8] += low * short_d                         # srlge
    st[9] += high * short_d                        # srhge
    st[10] += midw * short_d                       # srmge
    st[11] += extw * short_d                       # srege
    st[12] += low * long_d                         # lrlge
    st[13] += high * long_d                        # lrhge
    st[14] += midw * long_d                        # lrmge
    st[15] += extw * long_d                        # lrege
    r = st[0]
    mean_len = np1 / r
    lre = st[4] / r
    return [
        r, r / np1, mean_len, st[3] / r, lre, lre - mean_len**2,
        st[5] / r, st[6] / r, st[7] / r, st[16] / r,
        st[8] / r, st[9] / r, st[10] / r, st[11] / r,
        st[12] / r, st[13] / r, st[14] / r, st[15] / r,
    ]


def _shape_stats(n, su, sy, suu, syy, suy, path, umin, umax, ymin, ymax):
    """Closed-form prefix PCA + span/compacity from the moment state —
    same guards as kernels.shape_prefix."""
    nanrow = [np.nan] * len(SHAPE_OUT)
    if n < 2:
        return nanrow
    mu, my = su / n, sy / n
    a = suu / n - mu * mu
    c2 = syy / n - my * my
    b = suy / n - mu * my
    tr = a + c2
    disc = float(np.sqrt(((a - c2) / 2.0) ** 2 + b * b))
    l1 = tr / 2.0 + disc
    l2 = max(tr / 2.0 - disc, 0.0)
    if l1 > 0:
        major = 2.0 * float(np.sqrt(max(l1, 0.0)))
        minor = 2.0 * float(np.sqrt(l2))
        ecc = float(np.sqrt(min(max((l1 - l2) / l1, 0.0), 1.0)))
        if disc > 1e-12:
            vx = b if abs(b) > 1e-12 else (1.0 if a >= c2 else 0.0)
            vy = (l1 - a) if abs(b) > 1e-12 else (0.0 if a >= c2 else 1.0)
            angle = float(np.arctan2(vy, vx) % np.pi)
        else:
            angle = np.nan
    else:
        major = minor = ecc = angle = np.nan
    area = (umax - umin) * (ymax - ymin)
    compacity = path * path / (4 * np.pi * area) if area > 0 else np.nan
    return [major, minor, angle, ecc, path, area, compacity]


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True)
    if not len(rows):
        return
    rows = rows.sort_values(["ts", "turn_idx"], kind="mergesort")
    us = rows["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
    tlen = rows["tlen"].to_numpy(dtype=np.float64)
    levs = discretize_log(tlen, K)
    roles = (
        rows["role"].map(ROLE_IDX).fillna(KA - 1).to_numpy(dtype=np.int64)
    )
    has_tool = rows["tool"].notna().to_numpy().astype(np.int64)

    if state.exists:
        got = state.get
        (counts_l, prev_lev, n, su, sy, suu, syy, suy, path,
         umin, umax, ymin, ymax, t0_us, prev_u, prev_y,
         xcounts_l, prev_role) = got[:18]
        counts = np.array(counts_l, dtype=np.float64).reshape(K, K)
        xcounts = np.array(xcounts_l, dtype=np.float64).reshape(KA, K)
        rl_states, rl_hists = [], []
        for si in range(len(RUNLEN_SIGS)):
            sc, hl, hc = got[18 + 3 * si : 18 + 3 * si + 3]
            rl_states.append(list(sc))
            rl_hists.append(dict(zip(hl, hc)))
    else:
        counts = np.zeros((K, K))
        xcounts = np.zeros((KA, K))
        prev_lev, prev_role, n = -1, -1, 0
        su = sy = suu = syy = suy = path = 0.0
        umin = ymin = np.inf
        umax = ymax = -np.inf
        t0_us = int(us[0])
        prev_u = prev_y = 0.0
        rl_states = [
            [0.0] * (3 + _RL_ACC + g) for _, g in RUNLEN_SIGS
        ]
        rl_hists = [dict() for _ in RUNLEN_SIGS]

    out = {c: [] for c in ("conv_id", "turn_idx", "ts")}
    cooc_cols = [[] for _ in COOC_OUT]
    shape_cols = [[] for _ in SHAPE_OUT]
    xcooc_cols = [[] for _ in XCOOC_OUT]
    runlen_cols = [[] for _ in range(len(RUNLEN_SIGS) * len(RUNLEN_OUT))]
    for i in range(len(rows)):
        lev = int(levs[i])
        role = int(roles[i])
        pos = n  # 0-based row index within the conversation (pre-update)
        if prev_lev >= 0:
            counts[prev_lev, lev] += 1.0
            counts[lev, prev_lev] += 1.0
        if prev_role >= 0:
            xcounts[prev_role, lev] += 1.0
        prev_lev = lev
        prev_role = role
        u = (us[i] - t0_us) / 1e6
        y = tlen[i]
        if n >= 1:
            path += float(np.hypot(u - prev_u, y - prev_y))
        prev_u, prev_y = u, y
        n += 1
        su += u; sy += y
        suu += u * u; syy += y * y; suy += u * y
        umin = min(umin, u); umax = max(umax, u)
        ymin = min(ymin, y); ymax = max(ymax, y)

        out["conv_id"].append(key[0])
        out["turn_idx"].append(rows["turn_idx"].iloc[i])
        out["ts"].append(rows["ts"].iloc[i])
        for vals, v in zip(cooc_cols, _cooc_stats(counts)):
            vals.append(v)
        for vals, v in zip(
            shape_cols,
            _shape_stats(n, su, sy, suu, syy, suy, path,
                         umin, umax, ymin, ymax),
        ):
            vals.append(v)
        for vals, v in zip(xcooc_cols, _xcooc_stats(xcounts)):
            vals.append(v)
        sig_vals = (role, int(has_tool[i]), lev, min(pos // 4, 3))
        for si, (_, g) in enumerate(RUNLEN_SIGS):
            stats = _runlen_row(rl_states[si], rl_hists[si],
                                sig_vals[si], g, n)
            base = si * len(RUNLEN_OUT)
            for k2, v in enumerate(stats):
                runlen_cols[base + k2].append(v)

    rl_payload = []
    for si in range(len(RUNLEN_SIGS)):
        rl_payload.append([float(v) for v in rl_states[si]])
        hl = sorted(rl_hists[si])
        rl_payload.append([int(v) for v in hl])
        rl_payload.append([int(rl_hists[si][v]) for v in hl])
    state.update((
        [int(v) for v in counts.ravel()], int(prev_lev), int(n),
        float(su), float(sy), float(suu), float(syy), float(suy),
        float(path), float(umin), float(umax), float(ymin), float(ymax),
        int(t0_us), float(prev_u), float(prev_y),
        [int(v) for v in xcounts.ravel()], int(prev_role),
        *rl_payload,
    ))
    data = dict(out)
    for nm, vals in zip([f"cooc_{s}_d1_k4" for s in COOC_OUT], cooc_cols):
        data[nm] = vals
    for nm, vals in zip([f"shape_{s}" for s in SHAPE_OUT], shape_cols):
        data[nm] = vals
    for nm, vals in zip([f"xcooc_{s}_d1" for s in XCOOC_OUT], xcooc_cols):
        data[nm] = vals
    rl_names = [
        f"runlen_{st}_{sig}" for sig, _ in RUNLEN_SIGS for st in RUNLEN_OUT
    ]
    for nm, vals in zip(rl_names, runlen_cols):
        data[nm] = vals
    yield pd.DataFrame(data)


def streaming_prefix_features(stream: DataFrame) -> DataFrame:
    """Per-turn co-occurrence (lag 1, K=4) + shape prefix features over
    a live transcript stream, state-incremental per conversation."""
    src = stream.select(
        "conv_id", "turn_idx", "ts", "role", "tool",
        F.length("text").cast("double").alias("tlen"),
    )
    return src.groupBy("conv_id").applyInPandasWithState(
        _update, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
