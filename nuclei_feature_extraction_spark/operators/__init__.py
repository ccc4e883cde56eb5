from nuclei_feature_extraction_spark.operators.sessionize import sessionize  # noqa: F401
from nuclei_feature_extraction_spark.operators.asof import (  # noqa: F401
    asof_join,
    asof_join_broadcast,
    asof_join_cogrouped,
)
from nuclei_feature_extraction_spark.operators.windows import (  # noqa: F401
    with_lag_lead,
    with_rolling,
    with_masked_rolling,
    with_circular_time_mean,
)
from nuclei_feature_extraction_spark.operators.salt import (  # noqa: F401
    detect_heavy_keys,
    with_salted_key,
)
