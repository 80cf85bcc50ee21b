import shutil

import pytest

from anisearch_model_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="asms-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def index_dir(spark, tmp_path_factory):
    """A small built index shared by query-path tests."""
    from anisearch_model_spark.datagen import gen_transcripts
    from anisearch_model_spark.index.store import build_index

    d = str(tmp_path_factory.mktemp("idx") / "main")
    shutil.rmtree(d, ignore_errors=True)
    tr = gen_transcripts(spark, 3000, seed=42)
    build_index(spark, tr, d, num_buckets=6)
    return d
