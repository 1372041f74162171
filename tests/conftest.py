import pytest

from gogstash_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="gogstash_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_data_dir():
    """Deterministic generated transcripts+lookups for the smallest sf."""
    from gogstash_spark.sources.transcripts import ensure_transcripts

    return ensure_transcripts("/root/testdata/sf0.001")
