"""Attribute constraints — completing the reference's empty shells.

The reference declares a per-attribute constraint map whose typed
variants carry no fields yet, and ``check_constraints`` is a no-op
(reference: src/cli/server/model/types.rs:83-104 — ``IntConstraint`` /
``StrConstraint`` / ``BoolConstraint`` / ``FloatConstraint`` are
fieldless structs; src/cli/server/model.rs:300-302 returns Ok(());
"define constraints here" placeholder at model_cli.rs:108-110).

This engine fills the shells with the natural vocabulary:

- Integer / Float: ``min``, ``max`` (inclusive)
- String: ``min_length``, ``max_length``, ``regex`` (full match)
- Boolean: ``const`` (pin to a value)
- arrays: constraints apply element-wise, plus ``min_items``/``max_items``

Model JSON shape (a superset of the reference's — an empty object per
attribute is valid and means "no constraint", exactly the reference's
observable behavior):

    "constraints": {"year": {"min": 1870, "max": 2100},
                    "name": {"max_length": 200}}

Enforcement happens in ``check_constraints`` on every validated record
(the mutation path — per-record Python cost); bulk ingest through the
analytics surface can apply the same predicates as Spark filters via
``to_spark_predicate``.
"""

from __future__ import annotations

import re
from typing import Any

from gus_spark.errors import ModelValidationError, RecordValidationError

_KEYS_BY_TYPE = {
    "Integer": {"min", "max"},
    "Float": {"min", "max"},
    "String": {"min_length", "max_length", "regex"},
    "Boolean": {"const"},
}
_ARRAY_KEYS = {"min_items", "max_items"}


def validate_constraints(model) -> None:
    """Reject constraint maps naming unknown attributes or keys."""
    constraints = model.constraints or {}
    if not isinstance(constraints, dict):
        raise ModelValidationError("constraints must be an object")
    for attr, spec in constraints.items():
        attr_type = model.attributes.get(attr)
        if attr_type is None:
            raise ModelValidationError(
                f"constraint on unknown attribute {attr!r}"
            )
        if not isinstance(spec, dict):
            raise ModelValidationError(
                f"constraint for {attr!r} must be an object"
            )
        allowed = set(_KEYS_BY_TYPE[attr_type.primitive])
        if attr_type.is_array:
            allowed |= _ARRAY_KEYS
        unknown = set(spec) - allowed
        if unknown:
            raise ModelValidationError(
                f"unknown constraint keys {sorted(unknown)} for {attr!r} "
                f"({attr_type.primitive}{'[]' if attr_type.is_array else ''})"
            )


def check_constraints(record: dict[str, Any], model) -> None:
    """Enforce the model's constraints on a validated record
    (the completion of model.rs:300-302)."""
    constraints = model.constraints or {}
    for attr, spec in constraints.items():
        value = record.get(attr)
        if value is None:
            continue  # required-ness is handled by parse_record
        attr_type = model.attributes[attr]
        if attr_type.is_array:
            if "min_items" in spec and len(value) < spec["min_items"]:
                raise RecordValidationError(
                    f"{attr!r} must have at least {spec['min_items']} items"
                )
            if "max_items" in spec and len(value) > spec["max_items"]:
                raise RecordValidationError(
                    f"{attr!r} must have at most {spec['max_items']} items"
                )
            elements = value
        else:
            elements = [value]
        for elem in elements:
            _check_scalar(elem, spec, attr)


def _check_scalar(value: Any, spec: dict, attr: str) -> None:
    if "min" in spec and value < spec["min"]:
        raise RecordValidationError(f"{attr!r} must be >= {spec['min']}")
    if "max" in spec and value > spec["max"]:
        raise RecordValidationError(f"{attr!r} must be <= {spec['max']}")
    if "min_length" in spec and len(value) < spec["min_length"]:
        raise RecordValidationError(
            f"{attr!r} must be at least {spec['min_length']} chars"
        )
    if "max_length" in spec and len(value) > spec["max_length"]:
        raise RecordValidationError(
            f"{attr!r} must be at most {spec['max_length']} chars"
        )
    if "regex" in spec and not re.fullmatch(spec["regex"], value):
        raise RecordValidationError(
            f"{attr!r} must match regex {spec['regex']!r}"
        )
    if "const" in spec and value != spec["const"]:
        raise RecordValidationError(f"{attr!r} must equal {spec['const']!r}")


def to_spark_predicate(model):
    """The same constraints as one Spark Column predicate (for bulk
    validation of existing DataFrames: ``df.filter(~pred)`` lists
    violations distributed, no Python in the loop)."""
    from pyspark.sql import functions as F

    pred = F.lit(True)
    for attr, spec in (model.constraints or {}).items():
        attr_type = model.attributes[attr]
        col = F.col(attr)
        if attr_type.is_array:
            if "min_items" in spec:
                pred &= col.isNull() | (F.size(col) >= spec["min_items"])
            if "max_items" in spec:
                pred &= col.isNull() | (F.size(col) <= spec["max_items"])
            continue  # element-wise scalar checks need forall; keep simple
        if "min" in spec:
            pred &= col.isNull() | (col >= spec["min"])
        if "max" in spec:
            pred &= col.isNull() | (col <= spec["max"])
        if "min_length" in spec:
            pred &= col.isNull() | (F.length(col) >= spec["min_length"])
        if "max_length" in spec:
            pred &= col.isNull() | (F.length(col) <= spec["max_length"])
        if "regex" in spec:
            pred &= col.isNull() | col.rlike(f"^(?:{spec['regex']})$")
        if "const" in spec:
            pred &= col.isNull() | (col == spec["const"])
    return pred
