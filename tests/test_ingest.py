"""Bulk-ingest path: billion-row loads must never run per-row Python —
schema enforced at the read, required-ness + constraints as one Spark
predicate, dup handling as distributed joins, quarantine counts back."""

import contextlib
import io
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from gus_spark.errors import DuplicateKeyError
from gus_spark.model.types import ModelDefinition
from gus_spark.sources.ingest import bulk_ingest, validity_predicate
from gus_spark.storage.parquet_store import ParquetStore

MODEL = {
    "model_name": "reading",
    "attributes": {"id": "Integer", "celsius": "Float", "site": "String"},
    "primary_key": "id",
    "required": ["id", "site"],
    "constraints": {
        "celsius": {"min": -90.0, "max": 60.0},
        "site": {"regex": "[a-z]+"},
    },
}


@pytest.fixture()
def model():
    return ModelDefinition.from_json(MODEL)


@pytest.fixture()
def store(spark, tmp_path):
    return ParquetStore(spark, str(tmp_path / "warehouse"))


@pytest.fixture()
def fixture_path(spark, model, tmp_path):
    """8 rows: 5 valid, 1 constraint violation (celsius=999), 1 missing
    required site, 1 null pk."""
    rows = [
        (1, 20.5, "oslo"),
        (2, -10.0, "nuuk"),
        (3, 999.0, "doom"),   # constraint violation
        (4, 31.0, None),      # missing required
        (None, 5.0, "lima"),  # null pk
        (5, 12.0, "quito"),
        (6, 0.0, "hobart"),
        (7, 44.0, "dubai"),
    ]
    from pyspark.sql.types import StructField, StructType

    # source files are not schema-disciplined: write with every field
    # nullable; the model's StructType is applied at READ time
    nullable = StructType(
        [StructField(f.name, f.dataType, True)
         for f in model.to_struct_type().fields]
    )
    path = str(tmp_path / "batch")
    spark.createDataFrame(rows, nullable).write.parquet(path)
    return path


def test_bulk_ingest_quarantines_and_loads(spark, store, model, fixture_path,
                                           tmp_path):
    qpath = str(tmp_path / "quarantine")
    result = bulk_ingest(
        spark, store, model, fixture_path, quarantine_path=qpath
    )
    assert result == {"loaded": 5, "quarantined": 3, "conflicts": 0}
    assert store.count(model) == 5
    bad = spark.read.parquet(qpath)
    assert bad.count() == 3
    assert {r.celsius for r in bad.collect()} == {999.0, 31.0, 5.0}
    # loaded rows are point-readable through the CRUD surface
    assert store.read_one(model, "5")["site"] == "quito"


def test_bulk_ingest_conflict_modes(spark, store, model, fixture_path):
    bulk_ingest(spark, store, model, fixture_path)
    with pytest.raises(DuplicateKeyError):
        bulk_ingest(spark, store, model, fixture_path)
    result = bulk_ingest(
        spark, store, model, fixture_path, on_conflict="skip"
    )
    assert result["loaded"] == 0 and result["conflicts"] == 5
    assert store.count(model) == 5  # no duplicates introduced


def test_bulk_ingest_skip_keeps_one_winner_per_dup_key(spark, store, model,
                                                       tmp_path):
    """'skip' semantics on a batch-internal duplicate key: exactly one
    row survives, and the winner is the deterministic minimum under the
    full-row ordering — not zero rows, not an arbitrary pick."""
    rows = [
        (1, 20.5, "oslo"),
        (1, 20.5, "bergen"),  # same pk, later under full-row ordering
        (2, -10.0, "nuuk"),
    ]
    path = str(tmp_path / "dups")
    spark.createDataFrame(rows, model.to_struct_type()).write.parquet(path)
    with pytest.raises(DuplicateKeyError):
        bulk_ingest(spark, store, model, path)
    result = bulk_ingest(spark, store, model, path, on_conflict="skip")
    assert result == {"loaded": 2, "quarantined": 0, "conflicts": 1}
    assert store.count(model) == 2
    assert store.read_one(model, "1")["site"] == "bergen"  # min row wins
    # already-stored keys still drop whole on a re-load
    again = bulk_ingest(spark, store, model, path, on_conflict="skip")
    assert again["loaded"] == 0 and store.count(model) == 2


def test_bulk_plan_has_no_python_stage(spark, store, model, fixture_path):
    """The validation predicate must stay JVM-side: the plan for the
    valid-rows frame contains no Python evaluation operator."""
    from gus_spark.sources.readers import read_table

    df = read_table(spark, model, fixture_path).select(*model.field_order)
    valid = df.filter(F.coalesce(validity_predicate(model), F.lit(False)))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        valid.explain(mode="formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "codegen id" in plan  # filter runs inside whole-stage codegen


def test_validity_predicate_matches_per_record_matrix(spark, model):
    """Bulk predicate agrees with the CRUD-path validators row by row."""
    from gus_spark.model.constraints import check_constraints
    from gus_spark.errors import RecordValidationError

    rows = [
        {"id": 1, "celsius": 20.0, "site": "oslo"},
        {"id": 2, "celsius": -99.0, "site": "oslo"},
        {"id": 3, "celsius": None, "site": "oslo"},
        {"id": 4, "celsius": 10.0, "site": "OSLO"},
    ]
    df = spark.createDataFrame(
        [tuple(r[f] for f in model.field_order) for r in rows],
        model.to_struct_type(),
    )
    got = {
        r["id"]
        for r in df.filter(validity_predicate(model)).select("id").collect()
    }
    expected = set()
    for r in rows:
        try:
            check_constraints(r, model)
            expected.add(r["id"])
        except RecordValidationError:
            pass
    assert got == expected == {1, 3}
