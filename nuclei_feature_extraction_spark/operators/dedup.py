"""Deduplication operators for training-data pipelines.

All hot paths are pure JVM-side Catalyst expressions (xxhash64,
higher-order array functions, groupBy) — no Python in the data path at
all, so they scale to the 100 TB design point limited only by the
shuffle on the dedup key.

- exact_dedup:       hash-groupBy on the raw text
- minhash_lsh_pairs: word-shingle MinHash + banded LSH candidate pairs
- simhash:           64-bit SimHash + banded near-dup buckets
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Append ``dup_group_size`` and ``is_canonical`` (min id per exact
    text group survives). One shuffle on a 64-bit text hash — never on
    the full text bytes (100 TB: the shuffle key is 8 bytes/row)."""
    h = F.xxhash64(F.col(text_col))
    grouped = (
        df.withColumn("__th", h)
        .groupBy("__th")
        .agg(
            F.count(F.lit(1)).alias("dup_group_size"),
            F.min(id_col).alias("__canon"),
        )
    )
    return (
        df.withColumn("__th", h)
        .join(grouped, "__th")
        .withColumn("is_canonical", F.col(id_col) == F.col("__canon"))
        .drop("__th", "__canon")
    )


def _word_shingles(text_col: str, n: int) -> Column:
    return F.expr(
        f"transform(sequence(0, greatest(size(split(lower({text_col}), '\\\\s+')) - {n}, 0)), "
        f"i -> concat_ws(' ', slice(split(lower({text_col}), '\\\\s+'), i + 1, {n})))"
    )


def minhash_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    shingle: int = 3,
) -> DataFrame:
    """(id, h0..h{P-1}) MinHash signature via explode + xxhash64(shingle,
    seed_i) + min — whole-stage-codegen all the way."""
    sh = _word_shingles(text_col, shingle)
    exploded = df.select(F.col(id_col), F.explode(sh).alias("__sh"))
    return exploded.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64(F.col("__sh"), F.lit(i))).alias(f"mh{i}")
            for i in range(num_perm)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs (id_a < id_b, est_jaccard) via banded LSH.

    bands × (num_perm/bands) signature; docs sharing any band bucket are
    candidates; est_jaccard = fraction of agreeing minhash components.
    The band-bucket join shuffles only (band_id, 64-bit bucket hash).
    """
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    rows_per_band = num_perm // bands
    sig = minhash_signature(df, id_col, text_col, num_perm, shingle).cache()
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("bucket"))
        )
    buckets = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, "bb.band", "bb.bucket")
    a, b_ = buckets.alias("a"), buckets.alias("b")
    pairs = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    sa = sig.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(num_perm)],
    )
    sb = sig.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(num_perm)],
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(num_perm)
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", agree / F.lit(float(num_perm)))
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash per doc: explode tokens, per-bit ±1 votes summed
    JVM-side, sign → bit. Returns (id, simhash, band0..band3) where the
    four 16-bit bands support hamming≤3 near-dup bucketing (pigeonhole)."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("__t"),
    ).withColumn("__h", F.xxhash64("__t"))
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright("__h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(bits)
        ]
    )
    sim = sum(
        F.shiftleft(F.when(F.col(f"v{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"), i)
        for i in range(bits)
    )
    out = votes.withColumn("simhash", sim).select(id_col, "simhash")
    for band in range(4):
        out = out.withColumn(
            f"band{band}",
            F.shiftrightunsigned("simhash", band * 16).bitwiseAND(F.lit(0xFFFF)),
        )
    return out


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Candidate pairs whose simhash agrees on ≥1 of 4 bands, filtered
    to true hamming ≤ max_hamming via bit_count(xor)."""
    s = simhash(df, id_col, text_col).cache()
    pairs = None
    for band in range(4):
        a = s.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sa"), F.col(f"band{band}").alias("bk"))
        b = s.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sb"), F.col(f"band{band}").alias("bk"))
        p = a.join(b, ["bk"]).filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b", "sa", "sb")
        pairs = p if pairs is None else pairs.unionByName(p)
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        pairs.distinct()
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (id_a, id_b): join the
    shingle SETS back to the candidates and compute
    |A∩B| / |A∪B| with array_intersect/array_union — JVM-side, no
    Python. Use after LSH to turn candidates into verified duplicates."""
    sh = F.array_distinct(_word_shingles(text_col, shingle))
    docs = df.select(F.col(id_col), sh.alias("__sh"))
    a = docs.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sa"))
    b = docs.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__sb"))
    inter = F.size(F.array_intersect("__sa", "__sb"))
    union = F.size(F.array_union("__sa", "__sb"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.when(union > 0, inter / union.cast("double")).otherwise(F.lit(1.0)),
        )
        .select("id_a", "id_b", "jaccard")
    )
