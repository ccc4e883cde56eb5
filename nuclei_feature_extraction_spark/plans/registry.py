"""Feature-set registry — the analog of the reference's ``FeatureSet``
trait + name-based CLI selection (/root/reference/src/features/mod.rs:12-28,
src/args.rs:18-73).

The reference binds CLI names to kernel objects via ``to_fs`` and
macro-expands the ``All``/``Texture`` aliases WITHOUT dedup (args.rs:34-49
— ``texture glcm`` computes GLCM twice); here expansion dedups while
preserving first-occurrence order.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field


@dataclass(frozen=True)
class FeatureSetSpec:
    """One registered feature family."""

    name: str
    kind: str  # 'window' (pure Catalyst exprs) | 'kernel' (pandas kernel family)
    description: str
    params: dict = field(default_factory=dict)


FEATURE_REGISTRY: dict[str, FeatureSetSpec] = {
    s.name: s
    for s in [
        FeatureSetSpec(
            "session", "window",
            "30-min-gap session id (sessionize.py)",
        ),
        FeatureSetSpec(
            "laglead", "window",
            "lag-k text-length/role features (windows.with_lag_lead)",
        ),
        FeatureSetSpec(
            "rolling", "window",
            "trailing rows-frame mean/std/min/max of text length",
        ),
        FeatureSetSpec(
            "masked", "window",
            "assistant-masked rolling stats (color.rs:117-134 analog)",
        ),
        FeatureSetSpec(
            "circular", "window",
            "circular time-of-day mean (color.rs:144-155 analog)",
        ),
        FeatureSetSpec(
            "bank", "window",
            "multi-scale rolling bank (Gabor DC component, texture.rs:319-344)",
        ),
        FeatureSetSpec(
            "gabor", "window",
            "scale × phase quadrature bank (full Gabor parameter grid, "
            "texture.rs:319-361)",
        ),
        FeatureSetSpec(
            "cooc", "kernel",
            "prefix transition co-occurrence + 14 Haralick stats "
            "(GLCM analog, texture.rs:19-157)",
        ),
        FeatureSetSpec(
            "runlen", "kernel",
            "prefix run-length stats of role/tool/level streams "
            "(GLRLM analog, texture.rs:174-301)",
        ),
        FeatureSetSpec(
            "xcooc", "kernel",
            "cross-signal prefix co-occurrence (role lag-d × tlen level) "
            "— the 2-D direction analog of texture.rs:19 offsets",
        ),
        FeatureSetSpec(
            "shape", "kernel",
            "prefix PCA of (elapsed, signal) scatter "
            "(shape.rs:141-207 analog)",
        ),
    ]
}

ALIASES: dict[str, list[str]] = {
    # reference: All → every concrete set (args.rs:34-41)
    "all": [
        "session", "laglead", "rolling", "masked", "circular", "bank",
        "gabor", "cooc", "runlen", "xcooc", "shape",
    ],
    # reference: Texture → glcm glrlm gabor (args.rs:42-49)
    "texture": ["cooc", "runlen", "xcooc", "bank", "gabor"],
    "window": ["session", "laglead", "rolling", "masked", "circular"],
}


def expand_feature_sets(names: Sequence[str]) -> list[str]:
    """Alias expansion + dedup, preserving first-occurrence order."""
    out: list[str] = []
    seen: set[str] = set()
    for n in names:
        n = n.lower()
        expanded = ALIASES.get(n, [n])
        for e in expanded:
            if e not in FEATURE_REGISTRY:
                raise ValueError(
                    f"unknown feature set {e!r}; known: "
                    f"{sorted(FEATURE_REGISTRY)} + aliases {sorted(ALIASES)}"
                )
            if e not in seen:
                seen.add(e)
                out.append(e)
    return out
