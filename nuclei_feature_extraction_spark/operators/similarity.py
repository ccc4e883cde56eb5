"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``      : brute-force exact top-k against one query
  vector — the correctness baseline. Dot products via ``F.zip_with`` +
  ``F.aggregate`` (JVM higher-order fns, no Python).
- ``lsh_bucketed_topk``: random-hyperplane LSH signature → candidates
  share a signature band → exact re-rank inside buckets. The scale
  path: the crossJoin disappears, replaced by an equi-join on a small
  signature key.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine vs a constant query vector.

    Plan shape at scale: narrow map (dot product per row, codegen'd)
    → global top-k via TakeOrderedAndProject (no full sort, no shuffle
    of the vectors themselves).
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine_sim(F.col(vec_col).cast("array<double>"), q).alias("sim"),
    )
    return (
        scored.orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("sim", 6).alias("sim"))
    )


def with_lsh_signature(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    out_col: str = "lsh_sig",
) -> DataFrame:
    """Random-hyperplane signature: sign pattern of <v, plane_j> packed
    into one long. Planes are deterministic (seeded numpy), embedded as
    array literals — evaluated fully JVM-side."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    sig = F.lit(0).cast("long")
    v = F.col(vec_col).cast("array<double>")
    for j in range(n_planes):
        p = F.array(*[F.lit(float(x)) for x in planes[j]])
        bit = (_dot(v, p) > 0).cast("long")
        sig = sig + bit * F.lit(2**j).cast("long")
    return df.withColumn(out_col, sig)


def lsh_bucketed_topk(
    df: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN: candidates = rows sharing the LSH signature with the query
    (equi-join on the signature; queries broadcast), exact cosine
    re-rank per query, top-k per query via row_number."""
    from pyspark.sql import Window

    base = with_lsh_signature(df, dim, n_planes, vec_col)
    qs = with_lsh_signature(queries, dim, n_planes, vec_col).select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        F.col("lsh_sig"),
    )
    cand = base.join(F.broadcast(qs), "lsh_sig").withColumn(
        "sim",
        cosine_sim(
            F.col(vec_col).cast("array<double>"),
            F.col("__qvec").cast("array<double>"),
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.col(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", F.round("sim", 6).alias("sim"))
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 3,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at scale: ``n_tables``
    independent hyperplane-LSH signatures (near-identical vectors agree
    on a full signature with high probability), candidates = same-bucket
    pairs in ANY table, verified by exact cosine ≥ threshold. Shuffles
    only (table, 64-bit signature) keys — never the vectors pairwise."""
    cand = None
    for t in range(n_tables):
        sig = with_lsh_signature(
            df, dim, n_planes, vec_col, seed=42 + 1000 * t, out_col="__sig"
        ).select(F.col(id_col), F.col(vec_col), F.col("__sig"))
        a = sig.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"), "__sig"
        )
        b = sig.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"), "__sig"
        )
        p = (
            a.join(b, "__sig")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "__va", "__vb")
        )
        cand = p if cand is None else cand.unionByName(p)
    sim = cosine_sim(
        F.col("__va").cast("array<double>"), F.col("__vb").cast("array<double>")
    )
    return (
        cand.dropDuplicates(["id_a", "id_b"])
        .withColumn("sim", F.round(sim, 6))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
