"""Multimodal column plumbing (training-data pipeline staple).

Images/audio/video ride as opaque ``binary`` columns with a typed
metadata struct. The Spark-side plumbing — schema, partition-preserving
``mapInPandas`` batching, Arrow-safe UDF signatures, deterministic fake
feature extraction for tests — is real; the actual codec step is STUBBED
(``decode_stub=True`` produces deterministic pseudo-features from the
bytes; ``decode_stub=False`` raises NotImplementedError where a PIL /
torchaudio / ffmpeg call would slot in — those libs are not in this
container).

At 100 TB the shape matters: blobs never shuffle (all ops are narrow
per-partition maps), metadata-only predicates prune before any byte of
blob is touched, and the feature output drops the blob column so only
small vectors flow downstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("blob", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_s", T.DoubleType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (no external data)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    rows = []
    for i in range(n):
        blob = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8)
        rows.append(
            (
                i,
                str(kinds[i]),
                bytes(blob.tobytes()),
                (
                    int(rng.integers(16, 1024)),
                    int(rng.integers(16, 1024)),
                    float(rng.random() * 300),
                    f"x/{kinds[i]}",
                ),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _stub_features(blob: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-embedding: byte-histogram moments. Stands in
    for a real decode→model step; stable across runs and engines."""
    if blob is None or len(blob) == 0:
        return np.zeros(dim)
    arr = np.frombuffer(blob, dtype=np.uint8).astype(np.float64)
    chunks = np.array_split(arr, dim)
    return np.array([c.mean() / 255.0 if len(c) else 0.0 for c in chunks])


def extract_media_features(
    df: DataFrame,
    dim: int = FEATURE_DIM,
    decode_stub: bool = True,
    batch_limit_bytes: int = 256 << 20,
) -> DataFrame:
    """Per-blob feature vectors via ``mapInPandas`` (narrow — blobs never
    shuffle; output drops the blob). Real decode is a stub here."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("feat", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode needs PIL/torchaudio/ffmpeg — not in "
                    "this container; wire the codec here"
                )
            feats = [list(_stub_features(b, dim)) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat": feats,
                }
            )

    return df.mapInPandas(gen, out_schema)


def filter_media(
    df: DataFrame,
    kinds: list[str] | None = None,
    max_duration_s: float | None = None,
) -> DataFrame:
    """Metadata-only predicates — pushed to the scan, prune before any
    blob byte moves (check PushedFilters in .explain)."""
    out = df
    if kinds:
        out = out.filter(F.col("kind").isin(kinds))
    if max_duration_s is not None:
        out = out.filter(
            F.col("meta.duration_s").isNull()
            | (F.col("meta.duration_s") <= max_duration_s)
        )
    return out
