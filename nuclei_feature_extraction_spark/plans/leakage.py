"""Zero-temporal-leakage audit (SURVEY.md §4.3).

Two layers:

1. Static plan audit — ``audit_no_future_frames(df)`` scans every
   window expression in the ANALYZED logical plan and fails if its
   frame's upper bound extends past CURRENT ROW, unless the expression's
   output column is quarantined under the ``future_`` prefix. Catches a
   bad frame at plan-build time, before any data moves.

2. Runtime property tests (tests/test_leakage.py) — mutate/truncate
   rows after each anchor and assert identical features; they close the
   gap for leakage the plan text can't show (e.g. a pandas kernel
   reading ahead inside a batch).

The ``future_`` prefix is the quarantine contract: ``lead`` features
are real and useful for label construction, but they are EXCLUDED from
the verified feature vector (``verified_feature_columns``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

FUTURE_PREFIX = "future_"

# one window expression in analyzed-plan text ends like:
#   ... specifiedwindowframe(RowFrame, -1, -1)) AS v_lag1#4
#   ... specifiedwindowframe(RangeFrame, -3600, currentrow$())) AS m#7
#   ... specifiedwindowframe(RowFrame, 1, 1)) AS future_v_lead1#6
_WINEXPR_RE = re.compile(
    r"specifiedwindowframe\((\w+),\s*([^,()]+(?:\([^)]*\))?),\s*"
    r"([^,()]+(?:\([^)]*\))?)\)\)\s+AS (\w+)#"
)


class LeakageError(AssertionError):
    pass


def _upper_is_safe(upper: str) -> bool:
    upper = upper.strip()
    if "following" in upper:
        return False
    if "currentrow" in upper or "preceding" in upper:
        return True
    m = re.search(r"-?\d+", upper)
    if m is None:  # unknown bound form: fail closed
        return False
    return int(m.group(0)) <= 0


def audit_no_future_frames(df: DataFrame, allow_future_cols: bool = True) -> None:
    """Raise LeakageError if any window expression can read past the
    current row into a non-``future_`` output column.

    FAIL CLOSED on unparseable frames: every ``specifiedwindowframe``
    occurrence in the plan must be consumed by the expression regex —
    a frame the regex can't see (backticked alias, exotic bound
    nesting) raises instead of being silently skipped, so a
    future-reaching frame can never slip through a parse gap."""
    plan = df._jdf.queryExecution().analyzed().toString()
    n_frames = plan.count("specifiedwindowframe(")
    matched = 0
    for m in _WINEXPR_RE.finditer(plan):
        matched += 1
        upper, alias = m.group(3), m.group(4)
        if _upper_is_safe(upper):
            continue
        if allow_future_cols and alias.startswith(FUTURE_PREFIX):
            continue
        raise LeakageError(
            f"window column {alias!r} has future-reaching frame upper "
            f"bound {upper.strip()!r}; rename to {FUTURE_PREFIX}{alias} "
            "if intentional (quarantined from the verified vector)"
        )
    if matched < n_frames:
        raise LeakageError(
            f"leakage audit parsed only {matched} of {n_frames} window "
            "frames in the plan — unparsed frames fail closed; inspect "
            "df.explain(True) and extend _WINEXPR_RE"
        )


def verified_feature_columns(df: DataFrame) -> list[str]:
    """Columns participating in allclose verification: everything except
    quarantined ``future_*`` columns."""
    return [c for c in df.columns if not c.startswith(FUTURE_PREFIX)]
