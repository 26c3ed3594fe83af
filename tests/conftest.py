import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GUS_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("GUS_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from gus_spark.session import get_spark

    import tempfile

    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark(
        app_name="gus_spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            # static conf: needed by the bucketed-table tests
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="gus-wh-"),
        },
    )
    yield spark


@pytest.fixture(scope="session")
def tables(spark):
    from gus_spark.session import load_tables

    return load_tables(spark, SF_DIR)


@pytest.fixture()
def movie_model():
    """The reference's canonical fixture model (testing/model/movie.json)."""
    from gus_spark.model.types import ModelDefinition

    return ModelDefinition.from_json(
        {
            "model_name": "movie",
            "storage_type": "parquet",
            "attributes": {
                "id": "Integer",
                "name": "String",
                "year": "Integer",
                "actors": ["String"],
                "recommended": "Boolean",
            },
            "primary_key": "id",
            "required": ["id", "name", "recommended"],
        }
    )
