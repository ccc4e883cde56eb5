"""Multimodal plumbing + scan-pruning evidence."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from nuclei_feature_extraction_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_media_features,
    filter_media,
    synthesize_media,
)
from nuclei_feature_extraction_spark.sources.io import write_iceberg_style


def test_media_feature_plumbing(spark):
    media = synthesize_media(spark, n=48)
    feats = extract_media_features(media, decode_stub=True).toPandas()
    assert len(feats) == 48
    assert feats["feat"].map(len).eq(FEATURE_DIM).all()
    v = np.stack(feats["feat"].to_numpy())
    assert ((v >= 0) & (v <= 1)).all()
    # deterministic across runs
    again = extract_media_features(
        synthesize_media(spark, n=48), decode_stub=True
    ).toPandas()
    a = np.stack(feats.sort_values("media_id")["feat"].to_numpy())
    b = np.stack(again.sort_values("media_id")["feat"].to_numpy())
    assert np.array_equal(a, b)


def test_media_real_decode_all_kinds(spark):
    """The DEFAULT path runs a REAL codec for every kind (BMP / WAV /
    AVI) — the stub is the opt-in smoke mode, not the default."""
    media = synthesize_media(spark, n=12)
    got = extract_media_features(media).toPandas()
    assert len(got) == 12
    assert got["feat"].map(lambda f: np.isfinite(f).all()).all()


def test_media_batch_limit_bytes(spark):
    """batch_limit_bytes re-chunks Arrow batches by PAYLOAD size: a
    pathologically small limit (one blob per chunk) must produce the
    identical result, and the splitting helper must respect the byte
    budget with at-least-one-row progress."""
    import pandas as pd

    from nuclei_feature_extraction_spark.operators.multimodal import (
        _split_by_bytes,
    )

    media = synthesize_media(spark, n=24)
    want = (
        extract_media_features(media).toPandas()
        .sort_values("media_id").reset_index(drop=True)
    )
    got = (
        extract_media_features(media, batch_limit_bytes=1).toPandas()
        .sort_values("media_id").reset_index(drop=True)
    )
    assert got["media_id"].tolist() == want["media_id"].tolist()
    for a, b in zip(got["feat"], want["feat"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    pdf = pd.DataFrame({"blob": [b"a" * 10, b"b" * 10, b"c" * 25, b"d" * 5]})
    chunks = list(_split_by_bytes(pdf, 20))
    assert [len(c) for c in chunks] == [2, 1, 1]
    big = list(_split_by_bytes(pdf, 1))  # oversized rows still progress
    assert [len(c) for c in big] == [1, 1, 1, 1]
    assert list(_split_by_bytes(pdf, 10**9))[0].equals(pdf)


def test_media_metadata_filter(spark):
    media = synthesize_media(spark, n=64)
    out = filter_media(media, kinds=["image"], max_duration_s=100.0).toPandas()
    assert (out["kind"] == "image").all()


def _formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_parquet_filter_pushdown_and_column_pruning(spark, tiny_df, tmp_path):
    p = str(tmp_path / "t.parquet")
    tiny_df.write.parquet(p)
    df = (
        spark.read.parquet(p)
        .filter(F.col("conv_id") == "conv000001")
        .select("conv_id", "turn_idx")
    )
    plan = _formatted_plan(df)
    assert "PushedFilters: [IsNotNull(conv_id), EqualTo(conv_id,conv000001)]" in plan
    # column pruning: the scan must read only the 2 projected columns
    rs = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "text" not in rs and "turn_idx" in rs


def test_iceberg_style_partition_pruning(spark, tiny_df, tmp_path):
    p = str(tmp_path / "iceberg_like")
    write_iceberg_style(tiny_df, p, n_buckets=8)
    df = spark.read.parquet(p).filter(
        (F.col("bucket") == 3) & (F.col("dt") == "2024-02-01")
    )
    plan = _formatted_plan(df)
    # partition filters prune directories before any row is read
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:200]


# ------------------------------------------------- round 2: real codecs


def test_bmp_roundtrip_and_features_vs_numpy(spark):
    """Real BMP decode (pure numpy) through the Spark mapInPandas path:
    features equal a direct numpy computation on the source array."""
    from nuclei_feature_extraction_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_bmp,
        encode_bmp,
        extract_media_features,
        image_features,
    )

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(img)) == img).all()  # lossless roundtrip
    # odd width exercises the 4-byte row padding path
    df = spark.createDataFrame(
        [(0, "image", encode_bmp(img), (5, 7, None, "x/image"))],
        schema=MEDIA_SCHEMA,
    )
    got = extract_media_features(df, decode_stub=False).toPandas()
    want = image_features(img)
    assert np.allclose(np.array(got["feat"].iloc[0]), want, atol=1e-12)
    # channel means must match the raw array exactly
    assert abs(want[2] - img[:, :, 0].mean() / 255.0) < 1e-12


def test_wav_decode_and_features(spark):
    """Real WAV decode (stdlib wave): a sine wave's RMS ≈ A/√2, duration
    and rate recovered exactly."""
    from nuclei_feature_extraction_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_wav,
        encode_wav,
        extract_media_features,
    )

    rate, amp = 8000, 0.5
    t = np.arange(rate) / rate  # exactly 1 s
    sig = amp * np.sin(2 * np.pi * 440 * t)
    blob = encode_wav(sig, rate)
    x, r = decode_wav(blob)
    assert r == rate and len(x) == rate
    assert abs(np.sqrt((x**2).mean()) - amp / np.sqrt(2)) < 1e-3
    df = spark.createDataFrame(
        [(0, "audio", blob, (None, None, 1.0, "x/audio"))], schema=MEDIA_SCHEMA
    )
    feat = np.array(
        extract_media_features(df, decode_stub=False).toPandas()["feat"].iloc[0]
    )
    assert abs(feat[0] - np.log1p(1.0)) < 1e-6  # duration
    assert abs(feat[1] - amp / np.sqrt(2)) < 1e-3  # rms


def test_real_decode_corrupt_blob_fails_fast(spark):
    """Corrupt-input policy (P3): a malformed BMP raises, it does not
    silently produce features."""
    from nuclei_feature_extraction_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_features,
    )

    df = spark.createDataFrame(
        [(0, "image", b"THIS IS NOT A BMP", (0, 0, None, "x/image"))],
        schema=MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="not a BMP|BMP"):
        extract_media_features(df, decode_stub=False).collect()


def test_synthesized_media_real_decode_end_to_end(spark):
    """synthesize_media emits REAL BMP/WAV/AVI blobs: every kind decodes
    for real end-to-end."""
    from nuclei_feature_extraction_spark.operators.multimodal import (
        extract_media_features,
        synthesize_media,
    )

    media = synthesize_media(spark, n=48)
    got = extract_media_features(media, decode_stub=False).toPandas()
    assert len(got) == 48
    assert got["feat"].map(len).eq(8).all()
    assert got["feat"].map(lambda f: np.isfinite(f).all()).all()


def test_avi_roundtrip_lossless():
    """encode_avi → decode_avi is bit-lossless on frames and exact on
    fps (uncompressed 24-bit DIB path)."""
    from nuclei_feature_extraction_spark.operators.multimodal import (
        decode_avi,
        encode_avi,
    )

    rng = np.random.default_rng(3)
    for t, h, w, fps in [(1, 4, 4, 5), (3, 5, 7, 12), (6, 9, 3, 25)]:
        frames = rng.integers(0, 256, size=(t, h, w, 3), dtype=np.uint8)
        back, got_fps = decode_avi(encode_avi(frames, fps))
        assert np.array_equal(back, frames), (t, h, w)
        assert abs(got_fps - fps) < 1e-12


def test_avi_corrupt_and_unsupported_fail_fast(spark):
    """P3 fail-fast: truncated RIFF, non-AVI RIFF, and compressed
    ('00dc') frames all raise ValueError — never silent features."""
    from nuclei_feature_extraction_spark.operators.multimodal import (
        decode_avi,
        encode_avi,
    )

    frames = np.zeros((2, 4, 4, 3), dtype=np.uint8)
    good = encode_avi(frames, 10)
    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_avi(good[: len(good) // 2])
    with pytest.raises(ValueError):
        decode_avi(good.replace(b"00db", b"00dc"))
    with pytest.raises(ValueError):
        decode_avi(b"garbage")


def test_avi_audio_stream_first_still_decodes():
    """Regression: an AVI whose FIRST stream is audio must still bind
    the VIDEO strf — the decoder used to grab the first strf chunk of
    size >= 40 regardless of which strh opened it, parsing the audio
    format block as the video bpp/dims."""
    import struct

    from nuclei_feature_extraction_spark.operators.multimodal import (
        _riff_chunk,
        _riff_list,
        decode_avi,
        encode_avi,
    )

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(2, 4, 4, 3), dtype=np.uint8)
    good = encode_avi(frames, 10)

    # audio strl: 'auds' strh + a WAVEFORMATEX-ish strf padded to 40
    # bytes so it passes the old size>=40 gate
    a_strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0, 1, 16000, 0, 32000, 2,
        0xFFFFFFFF, 0, 0, 0, 0, 0,
    )
    a_strf = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16).ljust(40, b"\x00")
    audio_strl = _riff_list(
        b"strl", _riff_chunk(b"strh", a_strh) + _riff_chunk(b"strf", a_strf)
    )
    # splice the audio strl in front of the video strl inside hdrl
    hdrl_type_at = good.index(b"hdrl")
    avih_at = good.index(b"avih", hdrl_type_at)
    video_strl_at = good.index(b"LIST", avih_at)
    pre, post = good[:video_strl_at], good[video_strl_at:]
    spliced = pre + audio_strl + post
    # patch the RIFF and hdrl LIST sizes for the inserted bytes
    delta = len(audio_strl)
    spliced = bytearray(spliced)
    (riff_sz,) = struct.unpack_from("<I", spliced, 4)
    struct.pack_into("<I", spliced, 4, riff_sz + delta)
    (hdrl_sz,) = struct.unpack_from("<I", spliced, hdrl_type_at - 4)
    struct.pack_into("<I", spliced, hdrl_type_at - 4, hdrl_sz + delta)

    back, fps = decode_avi(bytes(spliced))
    assert np.array_equal(back, frames)
    assert abs(fps - 10) < 1e-12


def test_video_features_vs_numpy():
    """Feature values match a direct numpy recomputation on the decoded
    frames (motion energy, luma stats, drift)."""
    from nuclei_feature_extraction_spark.operators.multimodal import (
        decode_avi,
        encode_avi,
        video_features,
    )

    rng = np.random.default_rng(9)
    frames = rng.integers(0, 256, size=(4, 6, 5, 3), dtype=np.uint8)
    back, fps = decode_avi(encode_avi(frames, 8))
    f = video_features(back, fps)
    gray = (back.astype(np.float64) / 255.0) @ np.array([0.299, 0.587, 0.114])
    assert abs(f[3] - gray.mean()) < 1e-12
    assert abs(f[4] - gray.std()) < 1e-12
    assert abs(f[5] - np.abs(np.diff(gray, axis=0)).mean()) < 1e-12
    assert abs(f[7] - np.abs(gray[-1] - gray[0]).mean()) < 1e-12
    assert abs(f[0] - np.log1p(4 / 8)) < 1e-12


def test_resize_rgb_bilinear_correctness():
    """Bilinear resize vs direct half-pixel-center interpolation on a
    ramp image (and identity when sizes match)."""
    from nuclei_feature_extraction_spark.operators.multimodal import resize_rgb

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    assert np.array_equal(resize_rgb(img, 6, 9), img)  # identity
    # a horizontal ramp resized down stays a (near-)ramp: rows constant
    ramp = np.repeat(
        np.linspace(0, 255, 16, dtype=np.uint8).reshape(1, 16, 1), 8, axis=0
    ).repeat(3, axis=2)
    out = resize_rgb(ramp, 4, 8)
    assert out.shape == (4, 8, 3)
    assert (np.diff(out[0, :, 0].astype(int)) > 0).all()  # still increasing
    assert (out[0] == out[-1]).all()  # rows identical (no vertical mixing)


def test_sample_frame_indices():
    from nuclei_feature_extraction_spark.operators.multimodal import (
        sample_frame_indices,
    )

    assert sample_frame_indices(10, 20).tolist() == list(range(10))
    idx = sample_frame_indices(100, 4)
    assert idx.tolist() == [12, 37, 62, 87]  # bin centers
    assert sample_frame_indices(7, 1).tolist() == [3]


def test_transform_media_resize_and_frame_sample(spark):
    """transform_media: images resized to the target with meta updated,
    videos uniformly sampled with duration preserved, audio and
    untouched blobs byte-identical."""
    from nuclei_feature_extraction_spark.operators.multimodal import (
        decode_avi,
        decode_bmp,
        synthesize_media,
        transform_media,
    )

    media = synthesize_media(spark, n=36)
    before = {r["media_id"]: r for r in media.collect()}
    out = transform_media(media, image_size=(8, 10), video_frames=3)
    got = {r["media_id"]: r for r in out.collect()}
    assert set(got) == set(before)
    n_img = n_vid = 0
    for mid, row in got.items():
        kind = row["kind"]
        if kind == "image":
            img = decode_bmp(bytes(row["blob"]))
            assert img.shape == (8, 10, 3)
            assert row["meta"]["height"] == 8 and row["meta"]["width"] == 10
            n_img += 1
        elif kind == "video":
            frames, fps = decode_avi(bytes(row["blob"]))
            orig_frames, orig_fps = decode_avi(bytes(before[mid]["blob"]))
            assert len(frames) == min(3, len(orig_frames))
            # sampled frames are exact originals (no re-encode loss)
            assert any(
                np.array_equal(frames[0], of) for of in orig_frames
            )
            # duration approximately preserved (integer-fps rounding)
            assert row["meta"]["duration_s"] > 0
            n_vid += 1
        else:  # audio untouched, byte-identical
            assert bytes(row["blob"]) == bytes(before[mid]["blob"])
    assert n_img > 0 and n_vid > 0


def test_transform_media_noop_passthrough(spark):
    from nuclei_feature_extraction_spark.operators.multimodal import (
        synthesize_media,
        transform_media,
    )

    media = synthesize_media(spark, n=8)
    assert transform_media(media) is media

def test_transform_media_empty_video(spark):
    """ADVICE r4: a structurally valid AVI whose movi list has no frame
    chunks must fail with the decoders' ValueError, never a
    ZeroDivisionError from the fps re-timing math."""
    import numpy as np

    from nuclei_feature_extraction_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_avi,
        encode_avi,
        transform_media,
    )

    blob = encode_avi(np.zeros((1, 4, 4, 3), dtype=np.uint8), fps=5)
    # neutralize the single frame chunk: fourcc 00db -> JUNK keeps the
    # RIFF structure valid but leaves the movi list frameless
    empty = blob.replace(b"00db", b"JUNK", 1)
    with pytest.raises(ValueError, match="no frames"):
        decode_avi(empty)
    df = spark.createDataFrame(
        [(1, "video", bytearray(empty), (4, 4, 0.2, "x/video"))],
        schema=MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="no frames"):
        transform_media(df, video_frames=1).collect()
