"""Dedup recall/precision on planted near-duplicates + ANN sanity."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from nuclei_feature_extraction_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    simhash_near_dup_pairs,
)
from nuclei_feature_extraction_spark.operators.similarity import (
    cosine_topk,
    lsh_bucketed_topk,
)
from nuclei_feature_extraction_spark.operators.text import with_fingerprint

WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu "
    "xi omicron pi rho sigma tau upsilon phi chi psi omega"
).split()


@pytest.fixture(scope="module")
def planted_docs(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(60):
        toks = list(rng.choice(WORDS, size=60))
        rows.append((i, " ".join(toks)))
    # plant near-duplicates: docs 100.. are copies of 0..9 with ONE token changed
    base = {i: t for i, t in rows[:10]}
    for i in range(10):
        toks = base[i].split()
        toks[30] = "MUTATION"
        rows.append((100 + i, " ".join(toks)))
    # plant one exact duplicate pair
    rows.append((200, rows[5][1]))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_dedup_finds_planted_pair(spark, planted_docs):
    out = exact_dedup(planted_docs).toPandas()
    dup = out[out.dup_group_size > 1]
    assert sorted(dup.doc_id.tolist()) == [5, 200]
    assert dup.set_index("doc_id")["is_canonical"].to_dict() == {5: True, 200: False}


def test_minhash_recall_on_planted_near_dups(spark, planted_docs):
    pairs = minhash_lsh_pairs(planted_docs, num_perm=64, bands=16).toPandas()
    found = {tuple(sorted(p)) for p in zip(pairs.id_a, pairs.id_b)}
    planted = {(i, 100 + i) for i in range(10)}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"recall {recall}: {sorted(found)[:20]}"
    # est_jaccard high for planted pairs
    hits = pairs[[tuple(sorted(p)) in planted for p in zip(pairs.id_a, pairs.id_b)]]
    assert (hits.est_jaccard > 0.5).all()
    # no random-pair false positives with high estimated similarity
    noise = pairs[
        [tuple(sorted(p)) not in planted and 200 not in p and 5 not in p
         for p in zip(pairs.id_a, pairs.id_b)]
    ]
    assert (noise.est_jaccard < 0.5).all() if len(noise) else True


def test_simhash_finds_near_dups(spark, planted_docs):
    pairs = simhash_near_dup_pairs(planted_docs, max_hamming=6).toPandas()
    found = {tuple(sorted(p)) for p in zip(pairs.id_a, pairs.id_b)}
    planted = {(i, 100 + i) for i in range(10)} | {(5, 200)}
    assert len(found & planted) >= 8  # one-token edits keep hamming small


def test_fingerprint_stability_under_distant_edit(spark, planted_docs):
    fp = with_fingerprint(planted_docs).toPandas().set_index("doc_id")["fingerprint"]
    # doc 5 and its exact copy 200: identical fingerprints
    assert list(fp[5]) == list(fp[200])


def test_lsh_bucketed_topk_contains_self(spark):
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(200), "embedding": [list(map(float, v)) for v in vecs]})
    df = spark.createDataFrame(pdf)
    queries = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = lsh_bucketed_topk(df, queries, dim=16, k=5, n_planes=6).toPandas()
    for q in range(3):
        sub = got[got.query_id == q]
        assert len(sub) >= 1
        # the query vector itself shares its own bucket → rank 1, sim 1.0
        top = sub[sub["rank"] == 1].iloc[0]
        assert top.vec_id == q and abs(top.sim - 1.0) < 1e-6


def test_cosine_topk_exact_vs_numpy(spark):
    rng = np.random.default_rng(13)
    vecs = rng.standard_normal((300, 8)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(300), "embedding": [list(map(float, v)) for v in vecs]})
    df = spark.createDataFrame(pdf)
    q = vecs[0].astype(np.float64)
    got = cosine_topk(df, list(q), k=7).toPandas()
    v = vecs.astype(np.float64)
    sims = (v @ q) / (np.linalg.norm(v, axis=1) * np.linalg.norm(q))
    want = np.argsort(-sims, kind="stable")[:7]
    assert got.vec_id.tolist() == list(want)


def test_ngram_jaccard_verify_exact_values(spark, planted_docs):
    from nuclei_feature_extraction_spark.operators.dedup import (
        ngram_jaccard_verify,
    )

    pairs = minhash_lsh_pairs(planted_docs, num_perm=64, bands=16)
    verified = ngram_jaccard_verify(planted_docs, pairs).toPandas()
    byp = {tuple(sorted((a, b))): j for a, b, j in verified.itertuples(index=False)}
    assert byp.get((5, 200)) == 1.0  # exact duplicate
    # one-token edit in a 60-token doc: 58-shingle docs share all but 3
    for i in range(10):
        if (i, 100 + i) in byp:
            assert 0.8 < byp[(i, 100 + i)] < 1.0


def test_embedding_near_dup_pairs(spark):
    from nuclei_feature_extraction_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    rng = np.random.default_rng(21)
    base = rng.standard_normal((100, 16)).astype(np.float32)
    # plant 5 near-duplicates of vectors 0..4 (tiny perturbation)
    dup = base[:5] + rng.standard_normal((5, 16)).astype(np.float32) * 0.01
    vecs = np.vstack([base, dup])
    pdf = pd.DataFrame(
        {"vec_id": range(105), "embedding": [list(map(float, v)) for v in vecs]}
    )
    got = embedding_near_dup_pairs(
        spark.createDataFrame(pdf), dim=16, threshold=0.98
    ).toPandas()
    found = {tuple(sorted(p)) for p in zip(got.id_a, got.id_b)}
    planted = {(i, 100 + i) for i in range(5)}
    assert len(found & planted) >= 4  # multi-table LSH recall
    assert (got.sim >= 0.98).all()
