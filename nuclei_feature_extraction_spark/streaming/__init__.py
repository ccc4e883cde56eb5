from nuclei_feature_extraction_spark.streaming.sessions import (  # noqa: F401
    streaming_session_stats,
)
