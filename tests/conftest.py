import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from webcrawler_spark.session import get_spark

    s = get_spark(app_name="webcrawler-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_corpus():
    from webcrawler_spark.corpus import generate_corpus

    return generate_corpus(seed=42, n_hosts=5, n_pages=60)


@pytest.fixture(scope="session")
def pages_df(spark, small_corpus, tmp_path_factory):
    from webcrawler_spark.corpus import write_parquet

    out = str(tmp_path_factory.mktemp("corpus"))
    write_parquet(small_corpus, out)
    return spark.read.parquet(f"{out}/pages.parquet")
