import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drone_spark.catalog import Catalog  # noqa: E402
from drone_spark.corpus import generate_pages  # noqa: E402
from drone_spark.engine.superstep import SuperstepEngine  # noqa: E402
from drone_spark.extraction import edges_from_pages  # noqa: E402
from drone_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("drone-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def catalog(tmp_path):
    return Catalog(str(tmp_path / "catalog"))


@pytest.fixture()
def engine(spark, catalog):
    # checkpoint_every=5: full snapshots every 5th superstep keeps the
    # suite fast; resume tests build their own engine with 1.
    return SuperstepEngine(spark, catalog, num_parts=8, checkpoint_every=5)


@pytest.fixture(scope="session")
def small_pages(spark):
    return generate_pages(spark, 200, seed=42).cache()


@pytest.fixture(scope="session")
def small_edges(spark, small_pages):
    return edges_from_pages(small_pages).select("src", "dst").cache()


@pytest.fixture(scope="session")
def small_edges_pd(small_edges):
    return small_edges.toPandas()
