import pytest

from deepie_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="deepie_tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def world():
    from deepie_spark.sources.synth import gen_world

    return gen_world()


@pytest.fixture(scope="session")
def extractor(world):
    from deepie_spark.config.schema import SYNTH_SCHEMA
    from deepie_spark.operators.extract import PageExtractor

    return PageExtractor(SYNTH_SCHEMA, world.alias_rows)
