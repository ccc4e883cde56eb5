from nuclei_feature_extraction_spark.sources.io import (  # noqa: F401
    read_transcripts,
    write_features,
)
from nuclei_feature_extraction_spark.sources.checkpoint import (  # noqa: F401
    CheckpointedWriter,
)
