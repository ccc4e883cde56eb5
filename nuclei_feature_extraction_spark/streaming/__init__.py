from nuclei_feature_extraction_spark.streaming.sessions import (  # noqa: F401
    streaming_session_stats,
)
from nuclei_feature_extraction_spark.streaming.dedup import (  # noqa: F401
    streaming_dedup_exact,
)
from nuclei_feature_extraction_spark.streaming.stateful import (  # noqa: F401
    streaming_turn_state,
)
from nuclei_feature_extraction_spark.streaming.features import (  # noqa: F401
    streaming_prefix_features,
)
from nuclei_feature_extraction_spark.streaming.windows import (  # noqa: F401
    streaming_window_features,
)
