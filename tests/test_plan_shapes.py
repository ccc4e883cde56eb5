"""Physical-plan shape pins: the plans we designed are the plans Spark
runs. Counting Exchange (shuffle) nodes and forbidding cartesian
products catches silent plan regressions (a lost broadcast hint, an
accidental second shuffle) that correctness tests never see."""

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_exchanges(df) -> int:
    # count shuffle exchanges only (broadcast exchanges are fine/cheap)
    return _plan(df).count("ShuffleExchange") or _plan(df).count(
        "Exchange hashpartitioning"
    ) + _plan(df).count("Exchange rangepartitioning") + _plan(df).count(
        "Exchange RoundRobinPartitioning"
    )


def test_exact_dedup_single_shuffle(spark, planted_docs_small):
    from nuclei_feature_extraction_spark.operators.dedup import exact_dedup

    out = exact_dedup(planted_docs_small)
    assert _n_exchanges(out) == 1, _plan(out)
    assert "Join" not in _plan(out)  # window form, not groupBy+join


def test_gabor_bank_single_shuffle(spark, tiny_df):
    from nuclei_feature_extraction_spark.operators.windows import (
        gabor_rolling_bank,
    )

    out = gabor_rolling_bank(
        tiny_df.withColumn("tlen", F.length("text").cast("double")),
        "tlen", windows=(4, 16), n_phases=4,
    )
    # one conv_id exchange shared by row_number + all 16 window aggs
    assert _n_exchanges(out) == 1, _plan(out)


def test_circular_recentered_std_single_shuffle(spark, tiny_df):
    from nuclei_feature_extraction_spark.operators.windows import (
        circular_recentered_std,
    )

    out = circular_recentered_std(tiny_df, group_col="conv_id")
    assert _n_exchanges(out) == 1, _plan(out)


def test_asof_union_window_single_shuffle(spark, tiny_df, side_profile_df):
    from nuclei_feature_extraction_spark.operators.asof import asof_join

    out = asof_join(
        tiny_df, side_profile_df, on="conv_id", tie_cols=("plan",)
    )
    p = _plan(out)
    assert _n_exchanges(out) == 1, p  # union feeds ONE keyed window sort
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p


def test_dedup_similarity_plans_no_cartesian(spark, planted_docs_small):
    from nuclei_feature_extraction_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_all_pairs,
        simhash_near_dup_pairs,
    )

    for out in (
        minhash_lsh_pairs(planted_docs_small),
        simhash_near_dup_pairs(planted_docs_small),
        ngram_jaccard_all_pairs(planted_docs_small, threshold=0.5),
    ):
        assert "CartesianProduct" not in _plan(out), _plan(out)[:2000]


def test_minhash_signature_is_narrow(spark, planted_docs_small):
    """Zero shuffles: the signature never leaves its input partition."""
    from nuclei_feature_extraction_spark.operators.dedup import (
        minhash_signature,
    )

    out = minhash_signature(planted_docs_small)
    assert _n_exchanges(out) == 0, _plan(out)


def test_simhash_signature_is_narrow(spark, planted_docs_small):
    """Zero shuffles pre-bucketing: the per-row HOF vote fold replaces
    the explode + 64-aggregate groupBy exchange of round 2."""
    from nuclei_feature_extraction_spark.operators.dedup import simhash

    out = simhash(planted_docs_small)
    assert _n_exchanges(out) == 0, _plan(out)


def test_cosine_all_pairs_block_join_is_broadcast(spark):
    import numpy as np

    from nuclei_feature_extraction_spark.operators.similarity import (
        cosine_all_pairs_exact,
    )

    rng = np.random.default_rng(1)
    pdf = pd.DataFrame(
        {
            "vec_id": range(50),
            "embedding": [list(map(float, v)) for v in rng.standard_normal((50, 8))],
        }
    )
    out = cosine_all_pairs_exact(spark.createDataFrame(pdf), 0.9, n_blocks=4)
    p = _plan(out)
    # the combo fan-out must be the broadcast nested-loop (tiny side),
    # never a shuffled cartesian of the corpus with itself
    assert "CartesianProduct" not in p, p[:2000]
    assert "BroadcastNestedLoopJoin" in p, p[:2000]


@pytest.fixture(scope="module")
def planted_docs_small(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(30),
            "text": [f"alpha beta gamma delta {i} epsilon zeta" for i in range(30)],
        }
    )
    return spark.createDataFrame(pdf).cache()
