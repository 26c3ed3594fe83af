"""Schema migrations for stored tables — the reference's "planned"
feature (reference: README.md:13 lists migrations as unimplemented
future work; nothing in src/ touches schema evolution).

Because ``ParquetStore.read_df`` always applies the model's DECLARED
StructType to immutable parquet files, two whole classes of migration
are metadata-only — no data pass at all, which at 100 TB is the
difference between an instant deploy and rewriting the table:

- **add** a non-required attribute: absent columns read as null;
- **remove** an attribute: the projection simply stops reading it.

A data rewrite is required only when existing bytes must change:

- **retype** (widenings only: Integer→Float, and anything→String) —
  the parquet reader will not coerce, so files are rewritten with a
  cast;
- **add a required attribute** — a default must be supplied and
  back-filled (null would violate required-ness).

Disallowed: primary-key changes, narrowing/incompatible retypes, and
model renames (rename = create new + bulk copy, an explicit operation).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import functions as F

from gus_spark.errors import ModelValidationError
from gus_spark.model.types import ModelDefinition
from gus_spark.storage.parquet_store import ParquetStore

# widenings the rewrite may perform; everything else is an error
_COMPATIBLE_RETYPES = {
    ("Integer", "Float"),
    ("Integer", "String"),
    ("Float", "String"),
    ("Boolean", "String"),
}


@dataclass
class MigrationPlan:
    added: list[str] = field(default_factory=list)
    removed: list[str] = field(default_factory=list)
    retyped: list[tuple[str, str, str]] = field(default_factory=list)
    newly_required: list[str] = field(default_factory=list)

    @property
    def requires_rewrite(self) -> bool:
        return bool(self.retyped or self.newly_required)


def plan_migration(
    old: ModelDefinition, new: ModelDefinition
) -> MigrationPlan:
    """Classify the old→new delta; raises on unsupported changes."""
    if old.model_name != new.model_name:
        raise ModelValidationError(
            "model renames are not migratable in place — create the new"
            " model and bulk-copy instead"
        )
    if old.primary_key != new.primary_key:
        raise ModelValidationError("primary key changes are not migratable")
    plan = MigrationPlan()
    for attr, new_type in new.attributes.items():
        old_type = old.attributes.get(attr)
        if old_type is None:
            plan.added.append(attr)
            if attr in new.required:
                plan.newly_required.append(attr)
            continue
        # an EXISTING attribute promoted to required is also
        # newly_required: stored rows may hold nulls that the new schema
        # forbids, so the promotion must back-fill (or prove no nulls) —
        # silently treating it as metadata-only would leave the table
        # violating its own declared schema
        if attr in new.required and attr not in old.required:
            plan.newly_required.append(attr)
        if old_type != new_type:
            if (
                old_type.is_array != new_type.is_array
                or (old_type.primitive, new_type.primitive)
                not in _COMPATIBLE_RETYPES
            ):
                raise ModelValidationError(
                    f"cannot retype {attr!r}: "
                    f"{old_type.to_json()} -> {new_type.to_json()}"
                )
            plan.retyped.append(
                (attr, old_type.primitive, new_type.primitive)
            )
    plan.removed = [a for a in old.attributes if a not in new.attributes]
    return plan


def migrate(
    store: ParquetStore,
    old: ModelDefinition,
    new: ModelDefinition,
    defaults: dict[str, Any] | None = None,
) -> MigrationPlan:
    """Migrate the stored table from ``old``'s schema to ``new``'s.

    Metadata-only deltas return immediately; rewrites stream the table
    once (cast retyped columns, back-fill newly-required attributes
    from ``defaults``) and swap it in one snapshot commit — readers
    never see a half-migrated table, and time travel to pre-migration
    snapshots keeps working.
    """
    defaults = defaults or {}
    plan = plan_migration(old, new)
    # newly-ADDED required attributes always need a default (no stored
    # values exist). PROMOTED attributes (existed before, now required)
    # may omit one iff the stored column is already null-free — checked
    # against the data below, never assumed.
    missing = [
        a for a in plan.newly_required
        if a not in defaults and a not in old.attributes
    ]
    if missing:
        raise ModelValidationError(
            f"newly-required attributes need defaults: {missing}"
        )
    promoted_no_default = [
        a for a in plan.newly_required
        if a not in defaults and a in old.attributes
    ]
    if not promoted_no_default and not plan.requires_rewrite:
        return plan  # the declared-schema read path does the rest
    # ONE lock spans the null-free-promotion proof, the metadata-only
    # decision, and any rewrite: checked outside the lock, a concurrent
    # writer could commit a null into the promoted column between the
    # proof and the decision, leaving the table violating its newly
    # declared required-ness.
    with store._write_lock(old):
        if promoted_no_default:
            null_pred = None
            for a in promoted_no_default:
                p = F.col(a).isNull()
                null_pred = p if null_pred is None else (null_pred | p)
            if store.read_df(old).filter(null_pred).take(1):
                raise ModelValidationError(
                    "promoting to required with stored nulls present needs "
                    f"defaults: {promoted_no_default}"
                )
            # null-free promotion + no other rewrite work = metadata-only
            if not plan.retyped and not [
                a for a in plan.newly_required if a not in promoted_no_default
            ]:
                return plan
        if not plan.requires_rewrite:
            return plan
        df = store.read_df(old)
        cols = []
        for attr in new.field_order:
            spark_type = new.attributes[attr].to_spark()
            if attr in df.columns:
                col = F.col(attr).cast(spark_type)
                if attr in defaults and attr in plan.newly_required:
                    col = F.coalesce(col, F.lit(defaults[attr]).cast(spark_type))
            else:
                col = F.lit(defaults.get(attr)).cast(spark_type)
            cols.append(col.alias(attr))
        out = df.select(*cols)
        new_files = store._write_data_file(out, new)
        manifest = store._current_manifest(old)
        manifest["files"] = new_files
        store._commit(old, manifest)
    return plan
