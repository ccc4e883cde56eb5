from __future__ import annotations

import pandas as pd
import pytest

from nuclei_feature_extraction_spark.fixtures import (
    edge_case_transcripts,
    fixtures_dir,
    gen_side_model_config,
    gen_side_user_profile,
    gen_transcripts,
)
from nuclei_feature_extraction_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", shuffle_partitions=4, app_name="nfx-tests")
    yield s


@pytest.fixture(scope="session")
def tiny_pdf() -> pd.DataFrame:
    return gen_transcripts(50)


@pytest.fixture(scope="session")
def tiny_df(spark, tiny_pdf):
    return spark.createDataFrame(tiny_pdf).cache()


@pytest.fixture(scope="session")
def side_profile_pdf(tiny_pdf) -> pd.DataFrame:
    return gen_side_user_profile(tiny_pdf)


@pytest.fixture(scope="session")
def side_profile_df(spark, side_profile_pdf):
    return spark.createDataFrame(side_profile_pdf).cache()


@pytest.fixture(scope="session")
def side_config_df(spark):
    return spark.createDataFrame(gen_side_model_config()).cache()


@pytest.fixture(scope="session")
def edge_df(spark):
    return spark.createDataFrame(edge_case_transcripts()).cache()


@pytest.fixture(scope="session")
def small_dir() -> str:
    return fixtures_dir("small")
