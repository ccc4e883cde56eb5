from nuclei_feature_extraction_spark.operators.sessionize import sessionize  # noqa: F401
from nuclei_feature_extraction_spark.operators.asof import (  # noqa: F401
    asof_join,
    asof_join_broadcast,
    asof_join_cogrouped,
    asof_strategy_hint,
)
from nuclei_feature_extraction_spark.operators.windows import (  # noqa: F401
    circular_recentered_std,
    gabor_rolling_bank,
    multi_scale_rolling_bank,
    with_circular_time_mean,
    with_lag_lead,
    with_masked_rolling,
    with_rolling,
)
from nuclei_feature_extraction_spark.operators.salt import (  # noqa: F401
    detect_heavy_keys,
    with_salted_key,
)
from nuclei_feature_extraction_spark.operators.dedup import (  # noqa: F401
    connected_components,
    dup_groups,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_contamination,
    ngram_jaccard_all_pairs,
    ngram_jaccard_verify,
    simhash_near_dup_pairs,
)
from nuclei_feature_extraction_spark.operators.sampling import (  # noqa: F401
    deterministic_sample,
    pack_documents,
    with_split,
)
from nuclei_feature_extraction_spark.operators.similarity import (  # noqa: F401
    cosine_all_pairs_exact,
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_bucketed_topk,
)
