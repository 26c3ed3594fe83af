"""Model-definition validation matrix — ports the reference's invalid-model
fixtures (testing/model/*, src/cli/server/model/types.rs:303-362,
src/cli/server/model.rs:481-547) 1:1."""

import json

import pytest

from gus_spark.errors import ModelValidationError
from gus_spark.model.registry import parse_models
from gus_spark.model.types import ModelDefinition
from pyspark.sql.types import (
    ArrayType, BooleanType, LongType, StringType
)

BASE = {
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


def variant(**overrides):
    obj = json.loads(json.dumps(BASE))
    obj.update(overrides)
    return obj


def test_valid_model_schema(movie_model):
    st = movie_model.to_struct_type()
    # pk first, then alphabetical (graphql.rs:207-216)
    assert [f.name for f in st.fields] == [
        "id", "actors", "name", "recommended", "year"
    ]
    by_name = {f.name: f for f in st.fields}
    assert by_name["id"].dataType == LongType()
    assert not by_name["id"].nullable
    assert not by_name["name"].nullable
    assert by_name["year"].nullable
    assert by_name["actors"].dataType == ArrayType(StringType(), containsNull=False)
    assert by_name["recommended"].dataType == BooleanType()


def test_array_pk_rejected():  # fixture array_pk.json (types.rs:153-158)
    with pytest.raises(ModelValidationError):
        ModelDefinition.from_json(variant(primary_key="actors"))


def test_pk_not_an_attribute_rejected():  # invalid_pk.json (types.rs:159-161)
    with pytest.raises(ModelValidationError):
        ModelDefinition.from_json(variant(primary_key="nope"))


def test_pk_not_required_rejected():  # pk_not_required.json (types.rs:164-166)
    with pytest.raises(ModelValidationError):
        ModelDefinition.from_json(variant(required=["name"]))


def test_phantom_required_rejected():  # required_attr_doesnt_exist.json
    with pytest.raises(ModelValidationError):
        ModelDefinition.from_json(
            variant(required=["id", "name", "recommended", "phantom"])
        )


def test_multivalued_array_rejected():  # multivalued_array.json (types.rs:42)
    obj = variant()
    obj["attributes"]["actors"] = ["String", "Integer"]
    with pytest.raises(ModelValidationError):
        ModelDefinition.from_json(obj)


def test_no_plural_variant_rejected():  # inflection_no_plural_variant.json
    with pytest.raises(ModelValidationError):
        ModelDefinition.from_json(variant(model_name="yoga"))


def test_invalid_identifier_rejected():  # types.rs:248-262
    with pytest.raises(ModelValidationError):
        ModelDefinition.from_json(variant(model_name="1movie"))
    obj = variant()
    obj["attributes"]["Bad Name"] = "String"
    with pytest.raises(ModelValidationError):
        ModelDefinition.from_json(obj)


def test_parse_models_dir_skips_and_dedups(tmp_path):
    """model.rs:175-210: invalid files skipped; plural-camelCase duplicate
    names drop BOTH colliding models (model.rs:192-204)."""
    (tmp_path / "movie.json").write_text(json.dumps(BASE))
    (tmp_path / "not json.json").write_text("not json {")
    (tmp_path / "bad.json").write_text(json.dumps(variant(primary_key="nope")))
    # duplicate pair: same name in snake_case vs spinal-case -> same
    # pluralized camelCase key -> both dropped
    (tmp_path / "dup1.json").write_text(
        json.dumps(variant(model_name="cloned_movie"))
    )
    (tmp_path / "dup2.json").write_text(
        json.dumps(variant(model_name="cloned-movie"))
    )
    # inflection pair: singular vs plural of the same word -> collide
    (tmp_path / "infl1.json").write_text(json.dumps(variant(model_name="song")))
    (tmp_path / "infl2.json").write_text(json.dumps(variant(model_name="songs")))
    models = parse_models(str(tmp_path))
    assert [m.model_name for m in models] == ["movie"]
