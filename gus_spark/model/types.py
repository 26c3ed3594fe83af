"""Model definitions: the declared, validated schema system.

Re-expresses the reference's type layer (reference:
src/cli/server/model/types.rs) on Spark types:

- ``AttrType`` is a primitive or a single-element-type array
  (types.rs:38-43; serde enforces exactly one element type — fixture
  ``multivalued_array.json`` is invalid).
- Primitives: Integer -> LongType (i64, types.rs:46-47), String ->
  StringType, Boolean -> BooleanType. ``Float`` is declared-but-disabled
  in the reference (types.rs:50, 66, 291-296); this engine enables it as
  DoubleType since the analytics surface needs it.
- Array elements may never be null (model.rs:259-278) ->
  ``ArrayType(..., containsNull=False)``.
- ``nullable = attr not in required``; the primary key is always
  required, hence non-nullable.

Model-level validation ports types.rs:147-174 rule-for-rule, and
identifier validation ports the naming-convention regexes of
types.rs:248-262.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from gus_spark.errors import ModelValidationError
from gus_spark.inflect import has_distinct_plural

# storage_handler.rs:40-42 — the reference's enum admits only `json`;
# `parquet` is this engine's scale path and default.
STORAGE_TYPES = {"json", "parquet"}

# types.rs:46-50 — the primitive universe (Float enabled here; see module doc).
PRIMITIVES: dict[str, DataType] = {
    "Integer": LongType(),
    "String": StringType(),
    "Boolean": BooleanType(),
    "Float": DoubleType(),
}

# types.rs:248-262 — accepted identifier casings: PascalCase, camelCase,
# snake_case, spinal-case. Strictly alphabetic, exactly like the
# reference's validate_attr_name: a digit-bearing name ('user2') must be
# rejected here too, or model JSON round-tripped from this engine would
# fail to load on the reference.
_NAME_PATTERNS = [
    re.compile(r"^[A-Z][a-z]*([A-Z][a-z]*)*$"),   # PascalCase
    re.compile(r"^[a-z]+([A-Z][a-z]*)*$"),        # camelCase
    re.compile(r"^[a-z]+(_[a-z]+)*$"),            # snake_case
    re.compile(r"^[a-z]+(-[a-z]+)*$"),            # spinal-case
]


def is_valid_identifier(name: str) -> bool:
    return any(p.match(name) for p in _NAME_PATTERNS)


@dataclass(frozen=True)
class AttrType:
    """A primitive or single-element-type array (types.rs:38-43)."""

    primitive: str
    is_array: bool = False

    @classmethod
    def from_json(cls, value) -> "AttrType":
        if isinstance(value, str):
            if value not in PRIMITIVES:
                raise ModelValidationError(f"unknown attribute type {value!r}")
            return cls(value, False)
        if isinstance(value, list):
            # serde arity: arrays declare exactly one element type
            # (types.rs:42: `[PrimitiveType; 1]`).
            if len(value) != 1 or not isinstance(value[0], str):
                raise ModelValidationError(
                    "array attribute type must have exactly one element type"
                )
            if value[0] not in PRIMITIVES:
                raise ModelValidationError(f"unknown attribute type {value[0]!r}")
            return cls(value[0], True)
        raise ModelValidationError(f"invalid attribute type {value!r}")

    def to_spark(self) -> DataType:
        base = PRIMITIVES[self.primitive]
        if self.is_array:
            # null elements are rejected (model.rs:259-278)
            return ArrayType(base, containsNull=False)
        return base

    def to_json(self):
        return [self.primitive] if self.is_array else self.primitive


@dataclass
class ModelDefinition:
    """types.rs:107-116 — the declared schema of one table ('model')."""

    model_name: str
    attributes: dict[str, AttrType]
    primary_key: str
    required: list[str]
    storage_type: str = "parquet"
    constraints: dict = field(default_factory=dict)
    # engine extension (the reference has no FK concept): attr name ->
    # referenced model name; the attr's values must exist as that
    # model's primary keys. Enforced on demand via
    # storage.references.referential_violations (a distributed
    # anti-join), not per-write — the warehouse norm at scale.
    references: dict = field(default_factory=dict)

    @classmethod
    def from_json(cls, obj: dict) -> "ModelDefinition":
        try:
            attributes = {
                name: AttrType.from_json(t)
                for name, t in obj["attributes"].items()
            }
            model = cls(
                model_name=obj["model_name"],
                attributes=attributes,
                primary_key=obj["primary_key"],
                required=list(obj["required"]),
                storage_type=obj.get("storage_type", "parquet"),
                constraints=dict(obj.get("constraints") or {}),
                references=dict(obj.get("references") or {}),
            )
        except (KeyError, TypeError, AttributeError) as e:
            raise ModelValidationError(f"malformed model definition: {e}") from e
        validate_model_definition(model)
        return model

    def to_struct_type(self) -> StructType:
        """Spark schema: pk first, then remaining attrs alphabetically —
        the reference's observable field order (graphql.rs:207-216)."""
        names = [self.primary_key] + sorted(
            n for n in self.attributes if n != self.primary_key
        )
        return StructType(
            [
                StructField(
                    n,
                    self.attributes[n].to_spark(),
                    nullable=n not in self.required,
                )
                for n in names
            ]
        )

    @property
    def field_order(self) -> list[str]:
        return [f.name for f in self.to_struct_type().fields]


def validate_model_definition(model: ModelDefinition) -> None:
    """Port of validate_model_definition (types.rs:147-174)."""
    name = model.model_name
    if model.storage_type not in STORAGE_TYPES:
        # fixture invalid_storage.json must be rejected
        raise ModelValidationError(
            f"unknown storage type {model.storage_type!r}"
        )
    if not is_valid_identifier(name):
        # types.rs:219-246 — enforced during deserialization there
        raise ModelValidationError(f"invalid model name {name!r}")
    for attr in model.attributes:
        if not is_valid_identifier(attr):
            raise ModelValidationError(f"invalid attribute name {attr!r}")
    # types.rs:149-151 — the name must have a distinct plural form
    if not has_distinct_plural(name):
        raise ModelValidationError(
            f"model name {name!r} has no distinct plural variant"
        )
    # types.rs:153-161 — pk must exist and must not be an Array
    pk_type = model.attributes.get(model.primary_key)
    if pk_type is None:
        raise ModelValidationError(
            f"primary key {model.primary_key!r} is not an attribute"
        )
    if pk_type.is_array:
        raise ModelValidationError("primary key must not be an Array type")
    # types.rs:164-166 — pk must be required
    if model.primary_key not in model.required:
        raise ModelValidationError("primary key must be in required")
    # types.rs:167-171 — every required name must be an attribute
    for req in model.required:
        if req not in model.attributes:
            raise ModelValidationError(f"required attribute {req!r} does not exist")
    # engine completion of the reference's constraint shells
    # (types.rs:83-104; check is a no-op there, model.rs:300-302)
    from gus_spark.model.constraints import validate_constraints

    validate_constraints(model)
    # references: each FK attr must exist and be scalar (the referenced
    # model's existence is checked at query time — load order is free)
    if not isinstance(model.references, dict):
        raise ModelValidationError("references must be an object")
    for attr, target in model.references.items():
        attr_type = model.attributes.get(attr)
        if attr_type is None:
            raise ModelValidationError(
                f"reference on unknown attribute {attr!r}"
            )
        if attr_type.is_array:
            raise ModelValidationError(
                f"reference attribute {attr!r} must not be an Array"
            )
        if not isinstance(target, str) or not is_valid_identifier(target):
            raise ModelValidationError(
                f"reference target for {attr!r} must be a model name"
            )
