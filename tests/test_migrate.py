"""Schema-migration tests: metadata-only adds/removes, cast rewrites
with back-filled defaults, and the unsupported-change guards."""

import pytest

from gus_spark.errors import ModelValidationError
from gus_spark.model.types import ModelDefinition
from gus_spark.storage.migrate import migrate, plan_migration
from gus_spark.storage.parquet_store import ParquetStore


def _model(**over):
    base = {
        "model_name": "sensor",
        "attributes": {"id": "Integer", "value": "Integer", "site": "String"},
        "primary_key": "id",
        "required": ["id"],
    }
    base.update(over)
    return ModelDefinition.from_json(base)


@pytest.fixture()
def store(spark, tmp_path):
    return ParquetStore(spark, str(tmp_path / "wh"))


@pytest.fixture()
def seeded(store):
    model = _model()
    store.create_many(
        model,
        [
            {"id": 1, "value": 10, "site": "a"},
            {"id": 2, "value": 20, "site": "b"},
        ],
    )
    return model


def test_add_nullable_attr_is_metadata_only(store, seeded):
    new = _model(
        attributes={
            "id": "Integer", "value": "Integer", "site": "String",
            "note": "String",
        }
    )
    before = store.history(seeded)
    plan = migrate(store, seeded, new)
    assert plan.added == ["note"] and not plan.requires_rewrite
    assert store.history(seeded) == before  # no commit happened
    got = store.read_one(new, "1")
    assert got["note"] is None and got["value"] == 10
    # writes through the new schema round-trip
    store.create_one(new, {"id": 3, "note": "hi"})
    assert store.read_one(new, "3")["note"] == "hi"


def test_remove_attr_is_metadata_only(store, seeded):
    new = _model(attributes={"id": "Integer", "value": "Integer"})
    plan = migrate(store, seeded, new)
    assert plan.removed == ["site"] and not plan.requires_rewrite
    assert "site" not in store.read_df(new).columns
    assert store.read_one(new, "2") == {"id": 2, "value": 20}


def test_retype_and_new_required_rewrite(store, seeded):
    new = _model(
        attributes={
            "id": "Integer", "value": "Float", "site": "String",
            "unit": "String",
        },
        required=["id", "unit"],
    )
    with pytest.raises(ModelValidationError, match="defaults"):
        migrate(store, seeded, new)
    plan = migrate(store, seeded, new, defaults={"unit": "C"})
    assert plan.retyped == [("value", "Integer", "Float")]
    assert plan.newly_required == ["unit"]
    rows = {r["id"]: r for r in
            (row.asDict() for row in store.read_df(new).collect())}
    assert rows[1]["value"] == 10.0 and isinstance(rows[1]["value"], float)
    assert rows[1]["unit"] == "C" and rows[2]["site"] == "b"
    # post-migration CRUD uses the new schema (float value, required unit)
    store.create_one(new, {"id": 3, "value": 1.5, "unit": "F"})
    assert store.read_one(new, "3")["value"] == 1.5
    # time travel to the pre-migration snapshot still reads
    first_seq = store.history(new)[0][0]
    old_df = store.read_df(seeded, at=first_seq)
    assert old_df.count() == 2


def test_promote_existing_attr_to_required(store, seeded):
    """Promoting an EXISTING attribute to required is not silently
    metadata-only: stored nulls block the promotion unless a default
    back-fills them; a null-free column promotes without a rewrite."""
    promoted = _model(required=["id", "site"])
    assert plan_migration(seeded, promoted).newly_required == ["site"]

    # store holds a null site -> promotion without default must raise
    store.create_one(seeded, {"id": 3, "value": 30})
    with pytest.raises(ModelValidationError, match="defaults"):
        migrate(store, seeded, promoted)
    # with a default the nulls back-fill and the promotion commits
    plan = migrate(store, seeded, promoted, defaults={"site": "x"})
    assert plan.newly_required == ["site"]
    assert store.read_one(promoted, "3")["site"] == "x"
    assert store.read_one(promoted, "1")["site"] == "a"  # untouched


def test_promote_null_free_attr_is_metadata_only(store, seeded):
    promoted = _model(required=["id", "value", "site"])
    before = store.history(seeded)
    plan = migrate(store, seeded, promoted)  # no defaults needed
    assert set(plan.newly_required) == {"value", "site"}
    assert store.history(seeded) == before  # proved null-free, no commit
    assert store.read_one(promoted, "1")["site"] == "a"


def test_unsupported_changes_rejected(seeded):
    with pytest.raises(ModelValidationError, match="retype"):
        plan_migration(
            seeded,
            _model(attributes={"id": "Integer", "value": "Boolean",
                               "site": "String"}),
        )
    with pytest.raises(ModelValidationError, match="primary key"):
        plan_migration(
            seeded,
            _model(primary_key="site", required=["site"]),
        )
    with pytest.raises(ModelValidationError, match="rename"):
        plan_migration(seeded, _model(model_name="probe"))
