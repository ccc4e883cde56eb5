from nuclei_feature_extraction_spark.functions.timeutil import (  # noqa: F401
    epoch_seconds,
    epoch_long,
)
