import pytest


@pytest.fixture(scope="session")
def spark():
    from fuzzy_matching_spark.pipeline.session import build_session

    s = build_session(master="local[8]", shuffle_partitions=8, app_name="fms-tests")
    s.sparkContext.setCheckpointDir("/tmp/fms-checkpoints")
    yield s
