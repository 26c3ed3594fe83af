"""Declared-schema CSV/JSON readers and partition-pruned writes."""

import contextlib
import io
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from conftest import SF_DIR

from gus_spark.errors import StorageError
from gus_spark.model.types import ModelDefinition
from gus_spark.queries import table
from gus_spark.sources import read_table, write_partitioned

MODEL = ModelDefinition.from_json(
    {
        "model_name": "movie",
        "attributes": {"id": "Integer", "name": "String", "year": "Integer"},
        "primary_key": "id",
        "required": ["id", "name"],
    }
)


def test_csv_reader_declared_schema(spark, tmp_path):
    p = tmp_path / "movies.csv"
    p.write_text("id,name,year\n1,Heat,1995\n2,Ronin,1998\n")
    df = read_table(spark, MODEL, str(p), fmt="csv")
    assert [f.name for f in df.schema.fields] == ["id", "name", "year"]
    assert dict(df.dtypes)["id"] == "bigint"  # declared, not inferred
    assert {r.name for r in df.collect()} == {"Heat", "Ronin"}


def test_csv_failfast_on_malformed(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("id,name,year\n1,Heat,1995\nnot_an_int,X,Y\n")
    with pytest.raises(Exception):
        read_table(spark, MODEL, str(p), fmt="csv").collect()


def test_csv_permissive_quarantines(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("id,name,year\n1,Heat,1995\nnot_an_int,X,Y\n")
    df = read_table(spark, MODEL, str(p), fmt="csv", permissive=True)
    rows = df.collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(good) == 1 and good[0].id == 1
    assert len(bad) == 1 and "not_an_int" in bad[0]._corrupt_record


def test_json_reader(spark, tmp_path):
    p = tmp_path / "movies.jsonl"
    p.write_text('{"id": 1, "name": "Heat", "year": 1995}\n{"id": 2, "name": "Ronin"}\n')
    df = read_table(spark, MODEL, str(p), fmt="json")
    rows = {r.id: r for r in df.collect()}
    assert rows[2].year is None


def test_unknown_format_rejected(spark):
    with pytest.raises(StorageError):
        read_table(spark, MODEL, "/tmp/x", fmt="xml")


def test_partitioned_write_prunes(spark, tmp_path):
    out = str(tmp_path / "orders_by_status")
    orders = table(spark, SF_DIR, "orders")
    write_partitioned(orders, out, ["o_orderstatus"])
    # hive layout on disk
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(out))
    df = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    line = plan.split("PartitionFilters:", 1)[1].splitlines()[0]
    assert "o_orderstatus" in line  # the filter prunes directories
    expected = orders.filter(F.col("o_orderstatus") == "F").count()
    assert df.count() == expected


def test_orc_roundtrip_declared_schema(spark, tmp_path):
    """ORC joins the columnar formats: write via write_partitioned,
    read back through the declared model schema, with predicate
    pushdown reaching the ORC scan like parquet."""
    src = spark.createDataFrame(
        [(1, "a", 1990), (2, "b", 2000), (3, "c", 2010)],
        MODEL.to_struct_type(),
    )
    out = str(tmp_path / "movies_orc")
    write_partitioned(src, out, ["year"], fmt="orc")
    df = read_table(spark, MODEL, out, fmt="orc")
    assert {r.id for r in df.collect()} == {1, 2, 3}
    # partition pruning: a year filter must prune directories
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.filter(F.col("year") == 2000).explain(mode="formatted")
    assert "PartitionFilters" in buf.getvalue()
