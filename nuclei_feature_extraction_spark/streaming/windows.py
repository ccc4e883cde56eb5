"""STREAMING window-family features — the flagship's full window stack
(sessionize, lag/rolling/masked/circular, multi-scale + Gabor banks)
over a live transcript feed, with batch parity.

Every window feature looks back at most 64 rows (the largest bank
window) and at most 3 turns for lags, so the group state is simply the
conversation's LAST ≤64 RAW ROWS plus three scalars (the absolute
position and session id of the carried tail's first row, and the total
rows seen). Each micro-batch synthesizes the frame [carried tail + new
rows] and runs the SAME vectorized numpy implementation the fused batch
plan uses (``plans.fused._window_features_pdf``) with the absolute
position offset — so batch==streaming parity is by construction, not by
re-derivation — then emits only the new rows' features and keeps the
new tail.

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

from nuclei_feature_extraction_spark.plans.fused import (
    WINDOW_FEATURE_COLS,
    _window_features_pdf,
)

TAIL = 64  # longest lookback (the w=64 bank window)

_FLOAT_COLS = [
    c for c in WINDOW_FEATURE_COLS
    if c != "session_id" and not c.startswith("role_lag")
]
OUT_SCHEMA = (
    "conv_id string, turn_idx int, ts timestamp, session_id int, "
    + ", ".join(f"role_lag{k} string" for k in (1, 2, 3))
    + ", "
    + ", ".join(f"{c} double" for c in _FLOAT_COLS)
)
STATE_SCHEMA = (
    "tail_us array<long>, tail_tlen array<double>, tail_role array<string>, "
    "pos0 long, base_session long, n_seen long, "
    # out-of-order guard: (ts µs, turn_idx) high-water mark + drop count
    "last_turn int, n_late long"
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState,
    gap_minutes: float, late_policy: str,
) -> Iterator[pd.DataFrame]:
    from nuclei_feature_extraction_spark.streaming.features import _split_late

    rows = pd.concat(list(pdfs), ignore_index=True)
    if not len(rows):
        return
    rows = rows.sort_values(["ts", "turn_idx"], kind="mergesort")
    us_new = rows["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)

    n_late = 0
    if state.exists:
        (tail_us, tail_tlen, tail_role, pos0, base_session, n_seen,
         last_turn, n_late) = state.get
        tail_us = list(tail_us)
        tail_tlen = list(tail_tlen)
        tail_role = list(tail_role)
        rows, us_new, dropped = _split_late(
            rows, us_new, tail_us[-1], last_turn, late_policy, key[0]
        )
        n_late += dropped
        if not len(rows):  # whole batch was late duplicates
            state.update((
                tail_us, tail_tlen, tail_role, pos0, base_session, n_seen,
                last_turn, n_late,
            ))
            return
    else:
        # first batch of the conversation: still route intra-batch
        # replayed duplicates through the late policy (sentinel mark)
        rows, us_new, dropped = _split_late(
            rows, us_new, -(2**63), -1, late_policy, key[0]
        )
        n_late = dropped
        tail_us, tail_tlen, tail_role = [], [], []
        pos0, base_session, n_seen = 0, 0, 0

    tlen_new = rows["tlen"].to_numpy(dtype=np.float64)
    role_new = rows["role"].to_numpy()

    t = len(tail_us)
    m = len(rows)
    frame = pd.DataFrame(
        {
            "conv_id": key[0],
            "ts": np.concatenate(
                [np.array(tail_us, dtype=np.int64), us_new]
            ).astype("datetime64[us]"),
            "role": np.concatenate(
                [np.array(tail_role, dtype=object), role_new]
            ),
            "tlen": np.concatenate(
                [np.array(tail_tlen, dtype=np.float64), tlen_new]
            ),
        }
    )
    res = _window_features_pdf(frame, gap_minutes, pos_offset=int(pos0))
    sess = base_session + res["session_id"].to_numpy().astype(np.int64)

    data = {
        "conv_id": key[0],
        "turn_idx": rows["turn_idx"].to_numpy(),
        "ts": rows["ts"].to_numpy(),
        "session_id": sess[t:].astype(np.int32),
    }
    for k in (1, 2, 3):
        data[f"role_lag{k}"] = res[f"role_lag{k}"].to_numpy()[t:]
    for c in _FLOAT_COLS:
        data[c] = res[c].to_numpy()[t:]

    # new tail = the frame's last ≤64 rows
    keep = min(TAIL, t + m)
    cut = t + m - keep
    all_us = np.concatenate([np.array(tail_us, dtype=np.int64), us_new])
    all_tlen = np.concatenate(
        [np.array(tail_tlen, dtype=np.float64), tlen_new]
    )
    all_role = np.concatenate([np.array(tail_role, dtype=object), role_new])
    state.update((
        [int(v) for v in all_us[cut:]],
        [float(v) for v in all_tlen[cut:]],
        [str(v) for v in all_role[cut:]],
        int(pos0 + cut),
        int(sess[cut]),  # absolute session id of the new tail's first row
        int(n_seen + m),
        int(rows["turn_idx"].iloc[-1]),
        int(n_late),
    ))
    yield pd.DataFrame(data)


def streaming_window_features(
    stream: DataFrame, gap_minutes: float = 30.0,
    late_policy: str = "error",
) -> DataFrame:
    """Per-turn window-family features (45 columns) over a live
    transcript stream, state = the last 64 raw rows per conversation.

    ``late_policy``: ``'error'`` (default) fails the query on a row at
    or before the conversation's (ts, turn_idx) high-water mark;
    ``'drop'`` skips such rows (count carried in state)."""
    if late_policy not in ("error", "drop"):
        raise ValueError(f"late_policy must be 'error' or 'drop', got {late_policy!r}")

    def fn(key, pdfs, state):
        return _update(key, pdfs, state, gap_minutes, late_policy)

    src = stream.select(
        "conv_id", "turn_idx", "ts", "role",
        F.length("text").cast("double").alias("tlen"),
    )
    return src.groupBy("conv_id").applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
