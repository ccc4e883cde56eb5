"""nuclei_feature_extraction_spark — a from-scratch PySpark-native
point-in-time / as-of-join + windowed feature-engineering engine over
multi-turn transcript tables ``(conv_id, turn_idx, role, text, tool, ts)``.

Reimagines the per-item numeric-kernel pipeline of
``oxabz/nuclei-feature-extraction`` (reference at /root/reference; see
SURVEY.md for the operator-by-operator mapping) as a distributed Spark
DataFrame engine:

- gap-based sessionization (30-min inactivity cutoff)
- lag/lead + rolling per-conversation window features
- backfilled as-of joins against slowly-arriving side tables
- vectorized Arrow/pandas-UDF feature kernels (transition co-occurrence
  + Haralick stats, run-length stats, multi-scale rolling bank, prefix
  PCA) — the analogs of the reference's GLCM/GLRLM/Gabor/shape kernels
- explicit skew salting + AQE, zero-temporal-leakage audit,
  checkpoint/resume, per-partition lineage metrics

Everything is DataFrame/Catalyst-first; Python touches data only through
Arrow-batched pandas UDFs (no per-row Python anywhere).
"""

__version__ = "0.1.0"

from nuclei_feature_extraction_spark.session import get_spark  # noqa: F401
