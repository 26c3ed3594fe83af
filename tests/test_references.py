"""Declared foreign keys: model-level validation plus the distributed
anti-join integrity sweep."""

import pytest

from gus_spark.errors import ModelValidationError
from gus_spark.model.registry import ModelRegistry
from gus_spark.model.types import ModelDefinition
from gus_spark.storage.parquet_store import ParquetStore
from gus_spark.storage.references import check_references, referential_violations

AUTHOR = {
    "model_name": "author",
    "attributes": {"id": "Integer", "name": "String"},
    "primary_key": "id",
    "required": ["id"],
}
BOOK = {
    "model_name": "book",
    "attributes": {"id": "Integer", "title": "String", "author": "Integer"},
    "primary_key": "id",
    "required": ["id"],
    "references": {"author": "author"},
}


@pytest.fixture()
def env(spark, tmp_path):
    registry = ModelRegistry()
    registry.register(ModelDefinition.from_json(AUTHOR))
    registry.register(ModelDefinition.from_json(BOOK))
    store = ParquetStore(spark, str(tmp_path / "wh"))
    return registry, store


def test_reference_validation():
    with pytest.raises(ModelValidationError, match="unknown attribute"):
        ModelDefinition.from_json(dict(BOOK, references={"ghost": "author"}))
    with pytest.raises(ModelValidationError, match="model name"):
        ModelDefinition.from_json(dict(BOOK, references={"author": "Not Valid!"}))


def test_violations_found_and_cleared(env):
    registry, store = env
    author, book = registry.get("author"), registry.get("book")
    store.create_many(author, [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}])
    store.create_many(
        book,
        [
            {"id": 10, "title": "ok", "author": 1},
            {"id": 11, "title": "orphan", "author": 99},
            {"id": 12, "title": "no-fk", "author": None},  # null = fine
        ],
    )
    report = check_references(store, registry, book)
    assert report == {"author": 1}
    bad = referential_violations(store, registry, book)["author"]
    assert [r.id for r in bad.collect()] == [11]
    # repair the parent side -> sweep comes back clean
    store.create_one(author, {"id": 99, "name": "late"})
    assert check_references(store, registry, book) == {}
    # models without references report nothing
    assert check_references(store, registry, author) == {}


def test_unknown_parent_model_raises(spark, tmp_path):
    registry = ModelRegistry()
    registry.register(ModelDefinition.from_json(BOOK))
    store = ParquetStore(spark, str(tmp_path / "wh2"))
    with pytest.raises(ModelValidationError, match="unknown model"):
        referential_violations(store, registry, registry.get("book"))
