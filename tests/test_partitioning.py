"""ensure_min_partitions: scale-adaptive input fan-out (guide §2.5)."""

import pytest

from nuclei_feature_extraction_spark.partitioning import ensure_min_partitions


@pytest.fixture(scope="module")
def spark():
    from nuclei_feature_extraction_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=16,
                  app_name="test-partitioning")
    yield s


def test_fans_out_underpartitioned_input(spark):
    df = spark.range(1000).coalesce(1)
    out = ensure_min_partitions(df, min_bytes_per_task=0)
    # target = executor core count (4), NOT default.parallelism (16):
    # over-splitting tiny frames adds task waves to every downstream job
    assert out.rdd.getNumPartitions() == 4


def test_noop_when_already_wide(spark):
    df = spark.range(1000).repartition(8)
    out = ensure_min_partitions(df, min_bytes_per_task=0)
    assert out is df  # no extra shuffle inserted


def test_noop_below_bytes_floor(spark):
    # 1000 longs ≈ 8 KB: far under 64 KB/task — the fan-out shuffle
    # would cost more than the lone-task compute it parallelizes
    df = spark.range(1000).coalesce(1)
    out = ensure_min_partitions(df)
    assert out is df


def test_rows_unchanged(spark):
    df = spark.range(100).coalesce(1)
    got = sorted(
        r[0]
        for r in ensure_min_partitions(df, min_bytes_per_task=0).collect()
    )
    assert got == list(range(100))


def test_explicit_target(spark):
    df = spark.range(100).coalesce(1)
    out = ensure_min_partitions(df, target=2, min_bytes_per_task=0)
    assert out.rdd.getNumPartitions() == 2
