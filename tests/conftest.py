from __future__ import annotations

import pandas as pd
import pytest

from elastichash_spark.fixtures import gen_queries, gen_transcripts
from elastichash_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="elastichash-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def t1_pandas() -> pd.DataFrame:
    return gen_transcripts("t1")


@pytest.fixture(scope="session")
def t1_queries_pandas() -> pd.DataFrame:
    return gen_queries("t1")


@pytest.fixture(scope="session")
def t1(spark, t1_pandas):
    return spark.createDataFrame(t1_pandas)


@pytest.fixture(scope="session")
def t1_queries(spark, t1_queries_pandas):
    return spark.createDataFrame(t1_queries_pandas)
