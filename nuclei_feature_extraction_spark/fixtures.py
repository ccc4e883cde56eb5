"""Deterministic synthetic transcript fixtures (FIXTURES.md §1-§3).

The primary-table shape is fixed by BASELINE.json ``input_hint``:
``(conv_id string, turn_idx int32, role string, text string,
tool string, ts timestamp)``. Generation is pure vectorized numpy
(seed=42, no external data) and is cached as parquet under
``.cache/fixtures/<scale>/`` so pytest and bench reuse identical bytes.

Zipf-skewed conversation lengths (s=1.5, cap 20k) create the
mega-conversation skew the salting path exercises — the analog of the
reference's one-giant-slide workload (/root/reference/run.sh:43-55,
one process per slide).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

SEED = 42
ROLES = np.array(["user", "assistant", "tool", "system"])
TOOLS = np.array(["search", "exec", "read", "write"])
PLANS = np.array(["free", "pro", "team"])

# conversation counts per named scale (FIXTURES.md §1)
SCALES = {"tiny": 50, "small": 1_000, "bench": 20_000, "bench4x": 80_000}

_EPOCH_LO = np.datetime64("2024-01-01", "s").astype(np.int64)
_EPOCH_HI = np.datetime64("2024-03-31", "s").astype(np.int64)


def _conv_lengths(rng: np.random.Generator, n_convs: int) -> np.ndarray:
    return np.minimum(rng.zipf(1.5, n_convs), 20_000).astype(np.int64)


def gen_transcripts(n_convs: int, seed: int = SEED) -> pd.DataFrame:
    """Vectorized transcript table; one row per turn."""
    rng = np.random.default_rng(seed)
    lengths = _conv_lengths(rng, n_convs)
    n = int(lengths.sum())
    conv_num = np.repeat(np.arange(n_convs), lengths)
    starts = np.zeros(n, dtype=np.int64)
    starts[np.cumsum(lengths)[:-1]] = lengths[:-1]
    turn_idx = (np.arange(n) - np.cumsum(starts)).astype(np.int32)
    first = turn_idx == 0

    # roles: user/assistant base cycle with 20% uniform noise
    base = np.where(turn_idx % 2 == 0, 0, 1)  # user, assistant
    noise = rng.random(n) < 0.2
    role_idx = np.where(noise, rng.integers(0, 4, n), base)
    role = ROLES[role_idx]

    # timestamps: conv start ~ U(range); gap ~ LogNormal(3.2, 1.4) s, clip [1s, 4h]
    conv_start = rng.integers(_EPOCH_LO, _EPOCH_HI, n_convs)
    gaps = np.clip(rng.lognormal(3.2, 1.4, n), 1.0, 4 * 3600.0)
    gaps_us = (gaps * 1e6).astype(np.int64)
    gaps_us[first] = 0
    cum = np.cumsum(gaps_us)
    seg_base = np.repeat(cum[first] - gaps_us[first], lengths)
    ts_us = np.repeat(conv_start, lengths) * 1_000_000 + (cum - seg_base)
    ts = ts_us.astype("datetime64[us]")

    # text: deterministic from (conv_id, turn_idx); byte-preservation invariant
    pad = (conv_num * 1000003 + turn_idx.astype(np.int64) * 7919) % 200 + 5
    conv_id = np.char.add("conv", np.char.zfill(conv_num.astype("U7"), 6))
    text = (
        pd.Series(conv_id)
        + "-t"
        + pd.Series(turn_idx).astype(str)
        + "-"
        + pd.Series(pad).map(lambda k: "x" * int(k))
    )

    tool = np.where(role == "tool", TOOLS[rng.integers(0, 4, n)], None)

    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": text.to_numpy(),
            "tool": tool,
            "ts": ts,
        }
    )


def gen_side_user_profile(
    transcripts: pd.DataFrame, seed: int = SEED
) -> pd.DataFrame:
    """Slowly-arriving per-conversation dimension (FIXTURES.md §2).

    ~70% conv coverage; 1-5 updates each, some strictly AFTER the last
    turn (a correct as-of join must never pick those — leakage probe).
    """
    rng = np.random.default_rng(seed + 1)
    bounds = transcripts.groupby("conv_id", sort=True)["ts"].agg(["min", "max"])
    keep = rng.random(len(bounds)) < 0.7
    bounds = bounds[keep]
    n_upd = rng.integers(1, 6, len(bounds))
    conv = np.repeat(bounds.index.to_numpy(), n_upd)
    lo = np.repeat(bounds["min"].to_numpy().astype("datetime64[us]").astype(np.int64), n_upd)
    hi = np.repeat(bounds["max"].to_numpy().astype("datetime64[us]").astype(np.int64), n_upd)
    span = np.maximum(hi - lo, 1_000_000)
    # updates land in [start - span, end + span/4]: some before the conv,
    # some inside, some after the last turn
    eff = lo - span + (rng.random(len(conv)) * (2.25 * span)).astype(np.int64)
    return pd.DataFrame(
        {
            "conv_id": conv,
            "effective_ts": eff.astype("datetime64[us]"),
            "plan": PLANS[rng.integers(0, 3, len(conv))],
            "score": rng.random(len(conv)),
        }
    )


def gen_side_model_config(seed: int = SEED) -> pd.DataFrame:
    """Global keyless dimension — broadcast as-of path (FIXTURES.md §3)."""
    rng = np.random.default_rng(seed + 2)
    eff = np.linspace(_EPOCH_LO - 86_400, _EPOCH_HI, 10).astype(np.int64)
    return pd.DataFrame(
        {
            "effective_ts": (eff * 1_000_000).astype("datetime64[us]"),
            "model": [f"m{i}" for i in range(10)],
            "temperature": rng.random(10) * 2,
        }
    )


def fixtures_dir(scale: str, root: str | None = None) -> str:
    """Generate-or-reuse the parquet fixture set for a named scale."""
    if scale not in SCALES:
        raise ValueError(f"unknown scale {scale!r}; choose {sorted(SCALES)}")
    root = root or os.path.join(os.path.dirname(__file__), "..", ".cache", "fixtures")
    out = os.path.abspath(os.path.join(root, scale))
    marker = os.path.join(out, "_DONE_v2")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    tr = gen_transcripts(SCALES[scale])
    # small row groups so a Spark scan parallelizes across all cores (a
    # single huge row group caps the scan+shuffle-write stage at one task)
    tr.to_parquet(
        os.path.join(out, "transcripts.parquet"), index=False,
        row_group_size=131_072,
    )
    gen_side_user_profile(tr).to_parquet(
        os.path.join(out, "side_user_profile.parquet"), index=False
    )
    gen_side_model_config().to_parquet(
        os.path.join(out, "side_model_config.parquet"), index=False
    )
    with open(marker, "w") as fh:
        fh.write(f"rows={len(tr)}\n")
    return out


def edge_case_transcripts() -> pd.DataFrame:
    """Hand-written edge fixture (FIXTURES.md §4): 1-turn conv,
    exact-30-min gaps, duplicate ts (tie-break turn_idx), all-null tool,
    unsorted ingestion order."""
    t0 = np.datetime64("2024-02-01T00:00:00", "us")
    m = np.timedelta64(60, "s")
    rows = [
        # conv with exactly-30-min gaps: == 30min must NOT split
        ("edge_exact30", 0, "user", "a", None, t0),
        ("edge_exact30", 1, "assistant", "b", None, t0 + 30 * m),
        ("edge_exact30", 2, "user", "c", None, t0 + 60 * m),
        # gap of 30min + 1s: MUST split
        ("edge_split", 0, "user", "a", None, t0),
        ("edge_split", 1, "assistant", "b", None, t0 + 30 * m + np.timedelta64(1, "s")),
        # single-turn conversation
        ("edge_single", 0, "user", "only", None, t0),
        # duplicate ts within a conversation → tie-break by turn_idx
        ("edge_dupts", 0, "user", "x0", None, t0),
        ("edge_dupts", 1, "assistant", "x1", None, t0 + m),
        ("edge_dupts", 2, "tool", "x2", "search", t0 + m),
        ("edge_dupts", 3, "assistant", "x3", None, t0 + 2 * m),
    ]
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    # unsorted ingestion order: engine must not rely on physical order
    return df.sample(frac=1.0, random_state=7).reset_index(drop=True)
