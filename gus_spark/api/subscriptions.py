"""GraphQL subscription backend: a polling change-feed over the store's
snapshot sequence.

The reference generates an empty ``Subscription`` type and panics on
execution (reference: src/cli/server/model/graphql.rs:193, 251-253,
353 ``todo!()``). This module completes it: every committed snapshot
has a monotonically increasing ``seq``, so a cursor is just the last
seq a subscriber has seen — each poll diffs the manifests (new data
files only, not the whole table) and anti-joins against the previous
snapshot's keys to produce exactly the inserted records.

Scale shape: a poll that finds no new snapshot costs one local manifest
read (no Spark job at all). When there IS a delta, only the NEW data
files are scanned — O(insert batch), never O(table) — and the pk
anti-join against the previous snapshot prunes by manifest min/max
stats. The same cursor design backs resumable consumers: persist
``last_seq`` and resume later.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from gus_spark.errors import StorageError
from gus_spark.model.record import add_null_values
from gus_spark.model.types import ModelDefinition
from gus_spark.storage.parquet_store import ParquetStore


class ChangeFeed:
    """Cursor over one model's committed snapshots; ``poll()`` returns
    the records inserted since the previous poll (oldest-snapshot-first,
    pk-ordered within a batch)."""

    def __init__(self, store: ParquetStore, model: ModelDefinition):
        self.store = store
        self.model = model
        manifest = store._current_manifest(model)
        self.last_seq: int = manifest.get("seq", 0)
        self.last_paths: set[str] = {f["path"] for f in manifest["files"]}

    def poll(self) -> list[dict[str, Any]]:
        store, model = self.store, self.model
        manifest = store._current_manifest(model)
        seq = manifest.get("seq", 0)
        if seq == self.last_seq:
            return []  # manifest read only — no Spark job
        new_paths = [
            f["path"]
            for f in manifest["files"]
            if f["path"] not in self.last_paths
        ]
        records: list[dict] = []
        if new_paths:
            fresh = store.spark.read.schema(model.to_struct_type()).parquet(
                *new_paths
            )
            prev_keys = self._previous_keys()
            if prev_keys is not None:
                fresh = fresh.join(prev_keys, model.primary_key, "left_anti")
            rows = fresh.orderBy(model.primary_key).collect()
            records = [add_null_values(r.asDict(), model) for r in rows]
        self.last_seq = seq
        self.last_paths = {f["path"] for f in manifest["files"]}
        return records

    def _previous_keys(self):
        """pk frame of the snapshot this cursor last saw; None when
        there was no snapshot (or history has been expired — then every
        row in the new files counts as an insert, which is correct for
        a fresh table and conservative otherwise)."""
        if self.last_seq == 0:
            return None
        try:
            return self.store.read_df(self.model, at=self.last_seq).select(
                self.model.primary_key
            )
        except StorageError:  # expired by expire_snapshots
            return None
