"""Naive single-conversation NumPy oracles for the kernel families.

These define the SEMANTICS of every prefix feature: at anchor turn t the
statistic is computed from scratch over rows [0..t] only (zero temporal
leakage by construction). They are deliberately simple/quadratic — the
vectorized incremental implementations in kernels.py are tested against
them with np.allclose.

Formula provenance (public literature, parameterization mirrored from
the reference call sites):
- co-occurrence stats: Haralick et al. 1973 (the reference computes the
  same 14 over GLCMs, /root/reference/src/features/texture.rs:38-157);
  here the "image" is the lag-d transition stream of a discretized
  per-turn signal, symmetric + normalized like a standard GLCM.
- run-length stats: Galloway 1975 (reference GLRLM,
  texture.rs:174-301); runs of equal value along the turn sequence,
  the open run at the prefix end counted at its current length.
- prefix PCA: covariance eigen-decomposition of the (elapsed-seconds,
  signal) scatter (reference mask-PCA, shape.rs:141-207), with the
  same NaN-bail on degenerate input (shape.rs:142-184).
"""

from __future__ import annotations

import numpy as np

COOC_STATS = [
    "correlation", "contrast", "dissimilarity", "entropy", "asm",
    "sum_average", "sum_variance", "sum_entropy", "sum_of_squares",
    "idm", "difference_average", "difference_variance", "imc1", "imc2",
]
RUNLEN_STATS = [
    "n_runs", "rp", "mean_len", "sre", "lre", "rlvar", "gln", "lgre", "hgre",
    # round-3 completion to the reference's 17 GLRLM stats
    # (texture.rs:244-301): run-length nonuniformity + the joint
    # short/long × {low, high, mid, extreme} gray-level emphases.
    # Joint-emphasis weights follow the standard radiomics conventions
    # (Galloway 1975; Chu et al. 1990; Dasarathy & Holder 1991):
    # low(i) = 1/(i+1)², high(i) = (i+1)²; mid/extreme use the same
    # forms on the distance from the gray-level center d = |i−(G−1)/2|
    # (mid(i) = 1/(d+1)², extreme(i) = (d+1)²) — the tch-utils crate the
    # reference links is not vendored, so the mid/extreme weights are
    # our documented public-formula choice, tested against these oracles.
    "rln", "srlge", "srhge", "srmge", "srege",
    "lrlge", "lrhge", "lrmge", "lrege",
]
XCOOC_STATS = [
    # cross-signal (2-D direction analog) co-occurrence of the
    # ASYMMETRIC pair matrix C[i, j] = #{t: a_{t-d} = i, b_t = j}
    "contrast", "dissimilarity", "mean_a", "mean_b", "correlation",
    "asm", "entropy", "hx", "hy", "mi",
]
SHAPE_STATS = [
    "pca_major", "pca_minor", "pca_angle", "pca_eccentricity",
    # A8-A10 analogs: trajectory arc length (perimeter, shape.rs:89-92),
    # bounding span area (area), compacity = perimeter²/(4π·area)
    "path_len", "span_area", "compacity",
    # A8 proper (shape.rs:209-217 |mask − ellipse| analog): RMS deviation
    # of the prefix scatter from its fitted PCA ellipse — for each point
    # the squared Mahalanobis radius r² (whose fit-mean is exactly 2 in
    # 2-D), deviation = sqrt(E[(r² − 2)²])
    "elliptic_deviation",
    # A9/A10 proper (shape.rs:93-97 convex_hull_features): true convex
    # hull of the prefix scatter — area, perimeter (degenerate hulls are
    # flat polygons: perimeter 2·length, area 0), and deviation = the
    # fraction of the bounding span the hull fails to fill
    # (1 − hull_area/span_area), the convex-defect analog
    "hull_area", "hull_perimeter", "hull_deviation",
    # equivalent perimeter (shape.rs:91): 2·sqrt(π·hull_area) — the
    # circle-equivalent perimeter of the hull area
    "equiv_perimeter",
]


def hull_metrics_naive(u: np.ndarray, y: np.ndarray) -> tuple[float, float]:
    """Brute-force convex hull (Andrew monotone chain over the full
    sorted point set) → (area, perimeter). Defines the semantics the
    incremental kernel must match."""
    pts = sorted(set(zip(u.tolist(), np.asarray(y, float).tolist())))
    if len(pts) == 1:
        return 0.0, 0.0

    def _chain(seq):
        st: list[tuple[float, float]] = []
        for p in seq:
            while len(st) >= 2 and (
                (st[-1][0] - st[-2][0]) * (p[1] - st[-2][1])
                - (st[-1][1] - st[-2][1]) * (p[0] - st[-2][0])
            ) <= 0:
                st.pop()
            st.append(p)
        return st

    lower = _chain(pts)
    upper = _chain(list(reversed(pts)))
    hull = lower[:-1] + upper[:-1]
    area = 0.0
    perim = 0.0
    for i in range(len(hull)):
        x1, y1 = hull[i]
        x2, y2 = hull[(i + 1) % len(hull)]
        area += x1 * y2 - x2 * y1
        perim += float(np.hypot(x2 - x1, y2 - y1))
    return abs(area) / 2.0, perim


def discretize_log(values: np.ndarray, k: int, scale: float = 4096.0) -> np.ndarray:
    """Deterministic leakage-free bucketing of a nonnegative signal into
    k levels: floor(log1p(x)/log1p(scale) * k), clipped to [0, k-1]."""
    lev = np.floor(np.log1p(values) / np.log1p(scale) * k).astype(np.int64)
    return np.clip(lev, 0, k - 1)


def _xlogx(a: np.ndarray | float) -> np.ndarray | float:
    return np.where(a > 0, a * np.log(np.maximum(a, 1e-300)), 0.0)


def cooc_prefix_naive(x: np.ndarray, d: int, k: int) -> dict[str, np.ndarray]:
    """All 14 Haralick-style stats at every prefix of level stream x,
    rebuilt from a fresh symmetric co-occurrence matrix each time."""
    n = len(x)
    out = {s: np.full(n, np.nan) for s in COOC_STATS}
    for t in range(n):
        if t < d:
            continue
        ii = x[np.arange(d, t + 1) - d]
        jj = x[np.arange(d, t + 1)]
        c = np.zeros((k, k))
        np.add.at(c, (ii, jj), 1.0)
        np.add.at(c, (jj, ii), 1.0)
        s = c.sum()
        p = c / s
        iv = np.arange(k, dtype=float)
        px = p.sum(axis=1)
        mu = (iv * px).sum()
        var = (iv**2 * px).sum() - mu**2
        sig = np.sqrt(var)
        igrid, jgrid = np.meshgrid(iv, iv, indexing="ij")
        pij_ij = (igrid * jgrid * p).sum()
        out["correlation"][t] = (
            (pij_ij - mu * mu) / (sig * sig) if sig > 0 else np.nan
        )
        out["contrast"][t] = ((igrid - jgrid) ** 2 * p).sum()
        out["dissimilarity"][t] = (np.abs(igrid - jgrid) * p).sum()
        out["entropy"][t] = -_xlogx(p).sum()
        out["asm"][t] = (p**2).sum()
        ksum = igrid + jgrid
        psum = np.array([(p[ksum == kk]).sum() for kk in range(2 * k - 1)])
        kk = np.arange(2 * k - 1, dtype=float)
        sa = (kk * psum).sum()
        out["sum_average"][t] = sa
        out["sum_variance"][t] = ((kk - sa) ** 2 * psum).sum()
        out["sum_entropy"][t] = -_xlogx(psum).sum()
        out["sum_of_squares"][t] = var
        out["idm"][t] = (p / (1.0 + (igrid - jgrid) ** 2)).sum()
        ldiff = np.abs(igrid - jgrid)
        pdiff = np.array([(p[ldiff == ll]).sum() for ll in range(k)])
        ll = np.arange(k, dtype=float)
        da = (ll * pdiff).sum()
        out["difference_average"][t] = da
        out["difference_variance"][t] = ((ll - da) ** 2 * pdiff).sum()
        hxy = out["entropy"][t]
        hx = -_xlogx(px).sum()
        # symmetric: hy == hx, HXY1 == HXY2 == hx + hy (marginalization identity)
        denom = hx
        out["imc1"][t] = (hxy - 2 * hx) / denom if denom > 0 else np.nan
        arg = 1.0 - np.exp(-2.0 * (2 * hx - hxy))
        out["imc2"][t] = np.sqrt(max(arg, 0.0))
    return out


def runlen_prefix_naive(x: np.ndarray, n_levels: int = 4) -> dict[str, np.ndarray]:
    """Run-length stats at every prefix; the open run counts at its
    current (truncated) length — mirroring GLRLM's truncated edge runs.
    ``n_levels`` (G) parameterizes the mid/extreme gray-level weights."""
    n = len(x)
    out = {s: np.full(n, np.nan) for s in RUNLEN_STATS}
    ctr = (n_levels - 1) / 2.0
    for t in range(n):
        seq = x[: t + 1]
        runs: list[tuple[int, int]] = []  # (level, length)
        cur_v, cur_l = seq[0], 1
        for v in seq[1:]:
            if v == cur_v:
                cur_l += 1
            else:
                runs.append((cur_v, cur_l))
                cur_v, cur_l = v, 1
        runs.append((cur_v, cur_l))
        lens = np.array([l for _, l in runs], dtype=float)
        levs = np.array([v for v, _ in runs], dtype=float)
        r = len(runs)
        out["n_runs"][t] = r
        out["rp"][t] = r / (t + 1)
        out["mean_len"][t] = (t + 1) / r
        out["sre"][t] = (1.0 / lens**2).sum() / r
        out["lre"][t] = (lens**2).sum() / r
        out["rlvar"][t] = (lens**2).sum() / r - ((t + 1) / r) ** 2
        _, counts = np.unique(levs, return_counts=True)
        out["gln"][t] = (counts.astype(float) ** 2).sum() / r
        out["lgre"][t] = (1.0 / (levs + 1) ** 2).sum() / r
        out["hgre"][t] = ((levs + 1) ** 2).sum() / r
        # RLN = Σ_j (count of runs with length exactly j)² / R
        _, lcounts = np.unique(lens, return_counts=True)
        out["rln"][t] = (lcounts.astype(float) ** 2).sum() / r
        # joint short/long × gray-level emphases
        low = 1.0 / (levs + 1) ** 2
        high = (levs + 1) ** 2
        d = np.abs(levs - ctr)
        midw = 1.0 / (d + 1) ** 2
        extw = (d + 1) ** 2
        short = 1.0 / lens**2
        longw = lens**2
        out["srlge"][t] = (short * low).sum() / r
        out["srhge"][t] = (short * high).sum() / r
        out["srmge"][t] = (short * midw).sum() / r
        out["srege"][t] = (short * extw).sum() / r
        out["lrlge"][t] = (longw * low).sum() / r
        out["lrhge"][t] = (longw * high).sum() / r
        out["lrmge"][t] = (longw * midw).sum() / r
        out["lrege"][t] = (longw * extw).sum() / r
    return out


def xcooc_prefix_naive(
    a: np.ndarray, b: np.ndarray, d: int
) -> dict[str, np.ndarray]:
    """Brute-force cross co-occurrence: rebuild the full (a_{t-d}, b_t)
    pair matrix at every prefix. Defines the semantics of
    ``kernels.xcooc_prefix``."""
    n = len(a)
    out = {s: np.full(n, np.nan) for s in XCOOC_STATS}
    for t in range(n):
        if t < d:
            continue
        ii = np.asarray(a[: t + 1 - d], dtype=np.int64)
        jj = np.asarray(b[d : t + 1], dtype=np.int64)
        pairs = {}
        for i_, j_ in zip(ii.tolist(), jj.tolist()):
            pairs[(i_, j_)] = pairs.get((i_, j_), 0) + 1
        s_tot = float(len(ii))
        c = np.array(list(pairs.values()), dtype=np.float64)
        keys = np.array(list(pairs.keys()), dtype=np.float64)
        ki, kj = keys[:, 0], keys[:, 1]
        p = c / s_tot
        out["contrast"][t] = float((p * (ki - kj) ** 2).sum())
        out["dissimilarity"][t] = float((p * np.abs(ki - kj)).sum())
        ma, mb = float((p * ki).sum()), float((p * kj).sum())
        out["mean_a"][t], out["mean_b"][t] = ma, mb
        va = float((p * ki**2).sum()) - ma**2
        vb = float((p * kj**2).sum()) - mb**2
        cov = float((p * ki * kj).sum()) - ma * mb
        if va * vb > 1e-9:
            out["correlation"][t] = cov / np.sqrt(va * vb)
        out["asm"][t] = float((p**2).sum())
        out["entropy"][t] = float(-(p * np.log(p)).sum())
        pa = np.array([c[ki == v].sum() for v in np.unique(ki)]) / s_tot
        pb = np.array([c[kj == v].sum() for v in np.unique(kj)]) / s_tot
        out["hx"][t] = float(-(pa * np.log(pa)).sum())
        out["hy"][t] = float(-(pb * np.log(pb)).sum())
        out["mi"][t] = out["hx"][t] + out["hy"][t] - out["entropy"][t]
    return out


def shape_prefix_naive(u: np.ndarray, y: np.ndarray) -> dict[str, np.ndarray]:
    """Prefix PCA of the (u, y) scatter via np.cov + eigh (population
    covariance, /N). NaN until 2 points; NaN when top eigenvalue ≤ 0."""
    n = len(u)
    out = {s: np.full(n, np.nan) for s in SHAPE_STATS}
    for t in range(1, n):
        uu, yy = u[: t + 1], y[: t + 1]
        out["path_len"][t] = float(
            np.sqrt(np.diff(uu) ** 2 + np.diff(yy) ** 2).sum()
        )
        area = float((uu.max() - uu.min()) * (yy.max() - yy.min()))
        out["span_area"][t] = area
        if area > 0:
            out["compacity"][t] = out["path_len"][t] ** 2 / (4 * np.pi * area)
        h_area, h_perim = hull_metrics_naive(uu, yy)
        out["hull_area"][t] = h_area
        out["hull_perimeter"][t] = h_perim
        if area > 0:
            out["hull_deviation"][t] = 1.0 - h_area / area
        if h_area > 0:
            out["equiv_perimeter"][t] = 2.0 * np.sqrt(np.pi * h_area)
        pts = np.stack([u[: t + 1], y[: t + 1]])
        cov = np.cov(pts, bias=True)
        evals, evecs = np.linalg.eigh(cov)
        l2, l1 = float(evals[0]), float(evals[1])
        if l1 <= 0:
            continue
        l2 = max(l2, 0.0)
        out["pca_major"][t] = 2.0 * np.sqrt(l1)
        out["pca_minor"][t] = 2.0 * np.sqrt(l2)
        if (l1 - l2) / 2 > 1e-12:  # no principal direction when circular
            v = evecs[:, 1]
            out["pca_angle"][t] = np.arctan2(v[1], v[0]) % np.pi
        out["pca_eccentricity"][t] = np.sqrt((l1 - l2) / l1)
        # A8: RMS deviation of the scatter from the fitted ellipse —
        # needs an invertible covariance (≥3 points, non-collinear)
        a, b, c2 = cov[0, 0], cov[0, 1], cov[1, 1]
        det = a * c2 - b * b
        if t + 1 >= 3 and det > 1e-12 * a * c2:
            z = pts - pts.mean(axis=1, keepdims=True)
            r2 = (c2 * z[0] ** 2 - 2 * b * z[0] * z[1] + a * z[1] ** 2) / det
            out["elliptic_deviation"][t] = np.sqrt(
                max(((r2 - 2.0) ** 2).mean(), 0.0)
            )
    return out
