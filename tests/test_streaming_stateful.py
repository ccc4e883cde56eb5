"""Stateful streaming (applyInPandasWithState) == batch sessionize,
replayed across 2 micro-batches that split conversations mid-stream."""

import numpy as np
import pandas as pd

from nuclei_feature_extraction_spark.operators import sessionize
from nuclei_feature_extraction_spark.streaming.stateful import (
    streaming_turn_state,
)


def test_stateful_streaming_matches_batch(spark, tiny_pdf, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # split every conversation in half across two files: state must carry
    # last_ts/session/counter across the micro-batch boundary
    pdf = tiny_pdf.sort_values(["conv_id", "ts", "turn_idx"])
    half = pdf.groupby("conv_id").cumcount() < pdf.groupby("conv_id")[
        "turn_idx"
    ].transform("size") // 2
    pdf[half].to_parquet(src / "part-000.parquet", index=False)
    pdf[~half].to_parquet(src / "part-001.parquet", index=False)

    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_turn_state(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("turn_state")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = (
        spark.sql("SELECT * FROM turn_state")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        sessionize(spark.createDataFrame(tiny_pdf))
        .select("conv_id", "turn_idx", "session_id")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == len(tiny_pdf)
    assert (got["session_id"].to_numpy() == want["session_id"].to_numpy()).all()
    # turns_so_far is the running per-conversation count
    expect_counts = (
        tiny_pdf.sort_values(["conv_id", "ts", "turn_idx"])
        .groupby("conv_id")
        .cumcount()
        + 1
    )
    merged = got.sort_values(["conv_id", "ts", "turn_idx"])
    assert (
        merged["turns_so_far"].to_numpy()
        == expect_counts.to_numpy()
    ).all()
