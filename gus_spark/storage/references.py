"""Referential-integrity checks over declared model references.

The reference repo expresses relations only implicitly (its README's
"relations" are future work); this engine declares them in the model
JSON (``"references": {"attr": "parent_model"}``) and validates them the
way a warehouse does at scale: not per-write (which would serialize
every insert behind a parent lookup) but as a distributed sweep —
one LEFT ANTI join per FK, parent side reduced to its pk column so
Catalyst broadcasts small dimensions automatically.

NULL FK values are not violations (SQL semantics: an optional relation
is expressed by null; required-ness is the `required` list's job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gus_spark.errors import ModelValidationError
from gus_spark.model.registry import ModelRegistry
from gus_spark.model.types import ModelDefinition
from gus_spark.storage.parquet_store import ParquetStore


def referential_violations(
    store: ParquetStore,
    registry: ModelRegistry,
    model: ModelDefinition,
) -> dict[str, DataFrame]:
    """Per-FK frames of child rows whose reference matches no parent pk.

    Empty dict for models without references; each returned frame has
    the child's full schema (feed it to quarantine or repair jobs)."""
    out: dict[str, DataFrame] = {}
    child = store.read_df(model)
    for attr, parent_name in (model.references or {}).items():
        try:
            parent = registry.get(parent_name)
        except Exception as e:
            raise ModelValidationError(
                f"{model.model_name}.{attr} references unknown model"
                f" {parent_name!r}"
            ) from e
        parent_keys = store.read_df(parent).select(
            F.col(parent.primary_key).alias(attr)
        )
        out[attr] = child.filter(F.col(attr).isNotNull()).join(
            parent_keys, attr, "left_anti"
        )
    return out


def check_references(
    store: ParquetStore,
    registry: ModelRegistry,
    model: ModelDefinition,
) -> dict[str, int]:
    """Violation counts per FK attribute (the report shape CI gates
    want); {} means every declared reference holds."""
    return {
        attr: df.count()
        for attr, df in referential_violations(store, registry, model).items()
        if df.limit(1).count() > 0
    }
