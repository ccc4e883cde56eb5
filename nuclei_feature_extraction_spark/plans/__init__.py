from nuclei_feature_extraction_spark.plans.leakage import (  # noqa: F401
    audit_no_future_frames,
    verified_feature_columns,
)
from nuclei_feature_extraction_spark.plans.registry import (  # noqa: F401
    FEATURE_REGISTRY,
    expand_feature_sets,
)
