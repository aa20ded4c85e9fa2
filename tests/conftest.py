import shutil
import tempfile

import pytest

from news_crawler_spark.reference_model import run_reference_model
from news_crawler_spark.session import get_spark
from news_crawler_spark.synth import build_world

SCALE = 0.05  # small but exercises every profile/page path


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=8, shuffle_partitions=8,
                  extra_conf={"spark.sql.ansi.enabled": "false"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def world_py():
    return build_world(SCALE)


@pytest.fixture(scope="session")
def golden(world_py):
    return run_reference_model(world_py)


@pytest.fixture(scope="session")
def world(spark):
    from news_crawler_spark.sources.world import world_dfs

    return world_dfs(spark, SCALE)


@pytest.fixture()
def tmp_store():
    d = tempfile.mkdtemp(prefix="ncs_store_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
