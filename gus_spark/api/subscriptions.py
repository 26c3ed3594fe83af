"""GraphQL subscription backend: a polling change-feed over the store's
snapshot sequence.

The reference generates an empty ``Subscription`` type and panics on
execution (reference: src/cli/server/model/graphql.rs:193, 251-253,
353 ``todo!()``). This module completes it: every committed snapshot
has a monotonically increasing ``seq``, so a cursor is just the last
seq a subscriber has seen — each poll diffs the manifests (new data
files only, not the whole table) and classifies the delta by the
commit provenance the store records (``manifest["op"]``):

- pure-insert deltas (create_many / append_df commits) scan ONLY the
  new files — no anti-join, no previous-snapshot read at all;
- layout-only deltas (compact / z-order) contain no new records by
  definition — the cursor advances for free, no Spark job;
- rewrite deltas (update/delete/merge, or pre-provenance manifests)
  fall back to the pk anti-join against the previous snapshot.

Scale shape: a poll that finds no new snapshot costs one local manifest
read (no Spark job at all). When there IS a delta, the scan is
O(insert batch), never O(table), and delivery is PAGED — each poll
returns at most ``page_size`` records via a pk keyset cursor
(TakeOrderedAndProject, bounded driver memory), advancing the snapshot
cursor only once the delta is drained. The same cursor design backs
resumable consumers: persist ``last_seq`` and resume later.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import functions as F

from gus_spark.model.record import add_null_values
from gus_spark.model.types import ModelDefinition
from gus_spark.storage.parquet_store import ParquetStore

#: commit ops whose new files can contain no unseen records
_LAYOUT_OPS = {"layout"}
_INSERT_OPS = {"insert"}


class ChangeFeed:
    """Cursor over one model's committed snapshots; ``poll()`` returns
    the records inserted since the previous poll (oldest-snapshot-first,
    pk-ordered within a delta), at most ``page_size`` per call."""

    def __init__(
        self,
        store: ParquetStore,
        model: ModelDefinition,
        page_size: int = 1000,
    ):
        self.store = store
        self.model = model
        self.page_size = page_size
        manifest = store._current_manifest(model)
        self.last_seq: int = manifest.get("seq", 0)
        self.last_paths: set[str] = {f["path"] for f in manifest["files"]}
        #: previous-snapshot files read by the last anti-join fallback
        #: (after pk-range pruning) — observability for tests/ops
        self.last_anti_files: int = 0
        # in-flight delta being paged out: set when a poll finds more
        # rows than one page, cleared when the delta drains
        self._pending: dict | None = None

    def poll(self) -> list[dict[str, Any]]:
        if self._pending is None and not self._open_delta():
            return []  # manifest read only — no Spark job
        return self._next_page()

    # ------------------------------------------------------------ internals
    def _open_delta(self) -> bool:
        """Check for a new snapshot; stage it as the pending delta.
        Returns False when there is nothing new to deliver."""
        store, model = self.store, self.model
        manifest = store._current_manifest(model)
        seq = manifest.get("seq", 0)
        paths = {f["path"] for f in manifest["files"]}
        if seq == self.last_seq:
            return False
        ops = self._ops_between(self.last_seq, seq)
        if ops and all(op in _LAYOUT_OPS for op in ops):
            # compaction/z-order only: same records, new files — advance
            # the cursor without touching a single data file
            self.last_seq, self.last_paths = seq, paths
            return False
        new_files = [
            f for f in manifest["files"]
            if f["path"] not in self.last_paths
        ]
        if not new_files:
            self.last_seq, self.last_paths = seq, paths
            return False
        # combined pk range of the new files (manifest stats, no scan):
        # lets the anti-join fallback prune the previous snapshot to
        # overlapping files only. None when any stat is missing.
        los = [f.get("lo") for f in new_files]
        his = [f.get("hi") for f in new_files]
        have_stats = all(x is not None for x in los + his)
        self._pending = {
            "seq": seq,
            "paths": paths,
            "new_paths": [f["path"] for f in new_files],
            "new_range": (min(los), max(his)) if have_stats else None,
            # anti-join needed unless EVERY commit in range is an insert
            "need_anti": not (ops and all(op in _INSERT_OPS for op in ops)),
            "after_key": None,
        }
        return True

    def _ops_between(self, lo_seq: int, hi_seq: int) -> list[str] | None:
        """Provenance ops of commits with lo_seq < seq <= hi_seq, read
        from the retained manifests (local JSON, no Spark). None when
        any manifest in range is missing (expired) or pre-provenance —
        the caller then falls back to the conservative anti-join."""
        table = self.store._table_dir(self.model)
        by_seq = dict(self.store.history(self.model))
        ops = []
        for seq in range(lo_seq + 1, hi_seq + 1):
            name = by_seq.get(seq)
            if name is None:
                return None
            with open(os.path.join(table, name), encoding="utf-8") as fh:
                op = json.load(fh).get("op")
            if op is None:
                return None
            ops.append(op)
        return ops

    def _next_page(self) -> list[dict[str, Any]]:
        p = self._pending
        model = self.model
        pk = model.primary_key
        fresh = self.store.spark.read.schema(model.to_struct_type()).parquet(
            *p["new_paths"]
        )
        if p["need_anti"]:
            prev_keys = self._previous_keys(p["new_range"])
            if prev_keys is not None:
                fresh = fresh.join(prev_keys, pk, "left_anti")
        if p["after_key"] is not None:
            fresh = fresh.filter(F.col(pk) > F.lit(p["after_key"]))
        # limit+1 detects drain without a second job; orderBy+limit
        # compiles to TakeOrderedAndProject — bounded driver transfer
        rows = fresh.orderBy(pk).limit(self.page_size + 1).collect()
        page = rows[: self.page_size]
        if len(rows) <= self.page_size:  # delta drained
            self.last_seq, self.last_paths = p["seq"], p["paths"]
            self._pending = None
        else:
            p["after_key"] = page[-1][pk]
        return [add_null_values(r.asDict(), model) for r in page]

    def _previous_keys(self, new_range=None):
        """pk frame of the snapshot this cursor last saw, pruned by
        manifest pk-range stats to the files that can actually collide
        with the delta: a previous file whose [lo, hi] doesn't overlap
        ``new_range`` cannot contain any of the new files' keys, so a
        point update against a compacted (range-partitioned) table
        anti-joins O(1) files instead of the whole snapshot. Returns
        None when there was no snapshot (or history has been expired —
        then every row in the new files counts as an insert, which is
        correct for a fresh table and conservative otherwise)."""
        if self.last_seq == 0:
            return None
        store, model = self.store, self.model
        matches = [n for s, n in store.history(model) if s == self.last_seq]
        if not matches:  # expired by expire_snapshots
            return None
        with open(
            os.path.join(store._table_dir(model), matches[0]),
            encoding="utf-8",
        ) as fh:
            prev_files = json.load(fh)["files"]
        if new_range is not None:
            lo, hi = new_range
            prev_files = [
                f for f in prev_files
                if f.get("lo") is None or f.get("hi") is None
                or (f["lo"] <= hi and f["hi"] >= lo)
            ]
        self.last_anti_files = len(prev_files)  # observability (tests)
        if not prev_files:
            return None
        return (
            store.spark.read.schema(model.to_struct_type())
            .parquet(*[f["path"] for f in prev_files])
            .select(model.primary_key)
        )
