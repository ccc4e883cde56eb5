"""Deterministic split/sample + benchmark decontamination."""

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from nuclei_feature_extraction_spark.operators.sampling import (
    deterministic_sample,
    with_split,
)


@pytest.fixture(scope="module")
def ids_df(spark):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(2000), "text": ["x"] * 2000})
    )


def test_split_matches_reference_hashlib(spark, ids_df):
    """The assignment is a pure engine-independent function of the id:
    recompute it with python hashlib and compare row for row."""
    got = with_split(ids_df, seed="s0").toPandas().set_index("doc_id")["split"]

    def ref(i):
        h = hashlib.md5(f"s0:{i}".encode()).hexdigest()[:4]
        return "train" if h < "e666" else ("val" if h < "f333" else "test")

    for i in range(2000):
        assert got[i] == ref(i), i


def test_split_proportions_and_stability(spark, ids_df):
    got = with_split(ids_df, seed="s0").toPandas()
    frac = got["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.9) < 0.03
    assert abs(frac.get("val", 0) - 0.05) < 0.02
    assert abs(frac.get("test", 0) - 0.05) < 0.02
    # stable under repartitioning / row re-ordering
    again = (
        with_split(ids_df.repartition(7).orderBy(F.desc("doc_id")), seed="s0")
        .toPandas()
        .set_index("doc_id")["split"]
    )
    assert (got.set_index("doc_id")["split"].sort_index() == again.sort_index()).all()
    # a different seed produces a genuinely different assignment
    other = with_split(ids_df, seed="s1").toPandas().set_index("doc_id")["split"]
    assert (got.set_index("doc_id")["split"].sort_index() != other.sort_index()).any()


def test_sample_fraction_one_keeps_everything(spark, ids_df):
    """fraction=1.0 must keep every row (regression: the 65536 bound
    used to render as 5-char '10000', which compares lexicographically
    BELOW most 4-char buckets and silently kept only ~1/16 of rows)."""
    assert deterministic_sample(ids_df, 1.0, seed="s0").count() == 2000
    # near-1 fraction keeps nearly everything
    assert deterministic_sample(ids_df, 0.9999, seed="s0").count() >= 1990


def test_split_zero_weight_tail(spark, ids_df):
    """Cumulative weight reaches 1.0 before the last (zero-weight)
    label: every row must land in the earlier labels, none misassigned
    to the dead tail by the out-of-width bound."""
    got = with_split(
        ids_df, weights=(("train", 0.7), ("rest", 0.3), ("dead", 0.0)), seed="s0"
    ).toPandas()["split"]
    assert (got != "dead").all()
    assert set(got) == {"train", "rest"}


def test_split_weights_must_sum_to_one(spark, ids_df):
    with pytest.raises(ValueError, match="sum to 1"):
        with_split(ids_df, weights=(("a", 0.5), ("b", 0.3)))


def test_deterministic_sample_nested_and_stable(spark, ids_df):
    s10 = set(
        deterministic_sample(ids_df, 0.1, seed="s0").toPandas()["doc_id"]
    )
    s30 = set(
        deterministic_sample(ids_df, 0.3, seed="s0").toPandas()["doc_id"]
    )
    assert s10 <= s30  # nested: growing the fraction never drops rows
    assert abs(len(s10) / 2000 - 0.1) < 0.03
    assert abs(len(s30) / 2000 - 0.3) < 0.04
    again = set(
        deterministic_sample(ids_df.repartition(5), 0.1, seed="s0")
        .toPandas()["doc_id"]
    )
    assert s10 == again


def test_ngram_contamination_planted(spark):
    """A corpus doc sharing half its shingles with the benchmark scores
    ~0.5; a fully-copied doc scores 1.0; an unrelated doc 0.0."""
    from nuclei_feature_extraction_spark.operators.dedup import (
        ngram_contamination,
    )

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    half = "alpha beta gamma delta echo foxtrot golf hotel"
    clean = "one two three four five six seven eight"
    bench = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": [bench_text]})
    )
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": [bench_text, half, clean]}
        )
    )
    out = (
        ngram_contamination(corpus, bench, threshold=0.5)
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "contamination"] == 1.0 and bool(out.loc[1, "is_contaminated"])
    assert 0.2 < out.loc[2, "contamination"] < 0.7
    assert out.loc[3, "contamination"] == 0.0 and not bool(out.loc[3, "is_contaminated"])
    # integer bookkeeping: hits never exceed sizes
    assert (out["n_hit"] <= out["n_shingles"]).all()


def test_ngram_contamination_broadcast_parity(spark):
    """Broadcast and shuffled benchmark joins agree value-for-value."""
    from nuclei_feature_extraction_spark.operators.dedup import (
        ngram_contamination,
    )

    rng = np.random.default_rng(4)
    words = [f"w{i}" for i in range(50)]
    docs = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": [" ".join(rng.choice(words, size=20)) for _ in range(40)],
        }
    )
    corpus = spark.createDataFrame(docs[docs.doc_id % 4 != 0])
    bench = spark.createDataFrame(docs[docs.doc_id % 4 == 0])
    a = (
        ngram_contamination(corpus, bench, broadcast_benchmark=True)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        ngram_contamination(corpus, bench, broadcast_benchmark=False)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_pack_documents_contiguous_and_stable(spark):
    from nuclei_feature_extraction_spark.operators.sampling import (
        pack_documents,
    )

    rng = np.random.default_rng(8)
    docs = pd.DataFrame(
        {
            "doc_id": range(300),
            "text": [
                " ".join(f"t{j}" for j in range(rng.integers(1, 40)))
                for _ in range(300)
            ],
        }
    )
    df = spark.createDataFrame(docs)
    out = pack_documents(df, budget=64, n_shard_hex=1).toPandas()
    assert len(out) == 300
    assert (out["pack_offset"] < 64).all() and (out["pack_offset"] >= 0).all()
    assert (out["pack_id"] == out["start_tok"] // 64).all()
    # per shard, in doc_id order, the token intervals are contiguous
    for _, g in out.sort_values("doc_id").groupby("shard"):
        expect = 0
        for _, r in g.iterrows():
            assert r["start_tok"] == expect
            expect += r["n_tokens"]
    # stable under repartitioning
    again = (
        pack_documents(df.repartition(7), budget=64, n_shard_hex=1)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True), again
    )


def test_pack_documents_rejects_bad_budget(spark):
    from nuclei_feature_extraction_spark.operators.sampling import (
        pack_documents,
    )

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["a"]}))
    with pytest.raises(ValueError, match="budget"):
        pack_documents(df, budget=0)
