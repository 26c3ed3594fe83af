"""Bulk ingest: validated, fully-distributed loads into the store.

The CRUD path (`ParquetStore.create_many`) runs `parse_record` per row
in driver Python — correct for API-sized batches, fatal for a
billion-row load. This module is the bulk twin: schema enforcement
happens at the source read (declared StructType, never inferred),
required-ness and the model's constraint vocabulary compile to ONE
Spark predicate (`constraints.to_spark_predicate`), and duplicate
handling is a distributed anti-join — the driver only ever sees counts.

The validation semantics intentionally match the per-record matrix:
a row a strict `parse_record` would reject (missing required attr,
constraint violation) lands in quarantine instead of raising, because
at bulk scale "reject the batch" means "report and continue".
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gus_spark.errors import DuplicateKeyError
from gus_spark.model.constraints import to_spark_predicate
from gus_spark.model.types import ModelDefinition
from gus_spark.sources.readers import read_table
from gus_spark.storage.parquet_store import ParquetStore


def validity_predicate(model: ModelDefinition):
    """Required-ness + constraints as one JVM Column predicate.

    The bulk equivalent of ``parse_record``'s strict matrix for rows
    already in the declared schema (type coercion is impossible by
    construction — the source read enforces the StructType)."""
    pred = to_spark_predicate(model)
    for attr in model.required:
        pred &= F.col(attr).isNotNull()
    pred &= F.col(model.primary_key).isNotNull()
    return pred


def bulk_ingest(
    spark: SparkSession,
    store: ParquetStore,
    model: ModelDefinition,
    path: str,
    fmt: str = "parquet",
    on_conflict: str = "error",
    quarantine_path: str | None = None,
    **options: Any,
) -> dict[str, int]:
    """Load ``path`` into ``store`` with distributed validation.

    Returns ``{"loaded": n, "quarantined": n, "conflicts": n}``.

    - invalid rows (failed constraint / missing required) are counted,
      optionally written to ``quarantine_path``, and never committed;
    - ``on_conflict``: 'error' raises if any pk already exists or is
      duplicated within the batch (create_many semantics), 'skip' loads
      exactly one row per batch-duplicated key — the winner is the
      deterministic minimum under the full-row ordering (a distributed
      batch has no arrival order, so "first" must be defined by value) —
      and drops every row whose key already exists in the store.

    One snapshot commit; the plan contains no Python stage — assert
    with ``explain()``: no BatchEvalPython / ArrowEvalPython.
    """
    if on_conflict not in ("error", "skip"):
        raise ValueError(f"on_conflict must be 'error' or 'skip', got {on_conflict!r}")
    pk = model.primary_key
    df = read_table(spark, model, path, fmt=fmt, **options).select(
        *model.field_order
    )
    pred = validity_predicate(model)
    invalid = df.filter(~F.coalesce(pred, F.lit(False)))
    n_quarantined = invalid.count()
    if quarantine_path is not None and n_quarantined:
        invalid.write.mode("overwrite").parquet(quarantine_path)
    valid = df.filter(F.coalesce(pred, F.lit(False)))

    with store._write_lock(model):
        existing_keys = store.read_df(model).select(pk)
        # conflicts = batch-internal duplicates + keys already stored;
        # both are key-shuffle aggregations/joins, no driver key list
        dup_in_batch = (
            valid.groupBy(pk)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .select(pk)
        )
        clash = valid.select(pk).join(existing_keys, pk, "left_semi")
        conflict_keys = dup_in_batch.unionByName(clash).distinct()
        n_conflicts = conflict_keys.count()
        if n_conflicts and on_conflict == "error":
            sample = [r[0] for r in conflict_keys.limit(3).collect()]
            raise DuplicateKeyError(
                f"{n_conflicts} conflicting primary keys (e.g. {sample});"
                f" use on_conflict='skip' to load the rest"
            )
        # one deterministic winner per batch-duplicated key (min under
        # the full-row ordering); keys already in the store drop whole.
        # no broadcast hint on the anti-join: conflict sets are usually
        # tiny (AQE picks broadcast then) but a full re-load would make
        # them huge
        from pyspark.sql import Window

        w = Window.partitionBy(pk).orderBy(
            *[F.col(c) for c in model.field_order]
        )
        loadable = (
            valid.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .join(clash.distinct(), pk, "left_anti")
        )
        # keys_are_new is PROVEN here: batch-internal dups collapsed to
        # one winner, store-conflicting keys anti-joined out above — so
        # the commit may carry op='insert' and ChangeFeed's pure-insert
        # fast path stays valid.
        n_loaded = store.append_df(
            model, loadable, _locked=True, keys_are_new=True
        )
    return {
        "loaded": n_loaded,
        "quarantined": n_quarantined,
        "conflicts": n_conflicts,
    }
