"""Parquet-backed table store with atomic snapshot CRUD.

The reference's only storage backend deserializes the ENTIRE database
file and rewrites it on every operation, with no locking (reference:
src/cli/server/model/storage_handler/json/mod.rs:45-80) — concurrent
actix workers can race on read-modify-write. This store keeps the same
user-visible CRUD semantics (reference: json/mod.rs:84-138) but is built
like a miniature table format:

- a table is a directory of immutable parquet data files plus manifest
  JSON files; ``CURRENT`` names the active manifest;
- readers resolve ``CURRENT`` once and only ever see one consistent
  snapshot (the reference's reader race is structurally impossible);
- writers serialize through an exclusive per-table file lock
  (``fcntl.flock``) held across read-manifest → write-data → swap, so
  two concurrent mutations cannot lose an update (on non-POSIX
  platforms the store degrades to documented single-writer);
- ``create_one``/``create_many`` are O(new rows): they write ONE new
  parquet delta file and a new manifest referencing old files + the new
  one — not a table rewrite (the reference is O(database) per insert);
- ``update_one``/``delete_one`` rewrite only data files whose parquet
  row-group stats may contain the key (pruned via per-file min/max of the
  pk captured in the manifest), so point mutations touch O(one file);
- ``compact()`` folds accumulated delta files back into evenly-sized
  files — the maintenance job a real deployment schedules.

At cluster scale the same layout maps onto Delta Lake / Iceberg; the
manifest-pointer commit here is the same idea as their atomic metadata
swap, kept dependency-free for this environment.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from contextlib import contextmanager
from typing import Any, Iterable

try:  # POSIX-only; on other platforms the store is single-writer by doc
    import fcntl
except ImportError:  # pragma: no cover
    fcntl = None  # type: ignore[assignment]

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gus_spark.errors import DuplicateKeyError, NotFoundError, StorageError
from gus_spark.model.record import add_null_values, parse_record, parse_uri_id
from gus_spark.model.types import ModelDefinition


class ParquetStore:
    """One instance manages all model tables under ``warehouse_dir``."""

    def __init__(self, spark: SparkSession, warehouse_dir: str):
        self.spark = spark
        self.warehouse = warehouse_dir
        os.makedirs(warehouse_dir, exist_ok=True)

    # ------------------------------------------------------------------ paths
    def _table_dir(self, model: ModelDefinition) -> str:
        return os.path.join(self.warehouse, model.model_name)

    @contextmanager
    def _write_lock(self, model: ModelDefinition):
        """Exclusive per-table writer lock held across the whole
        read-manifest → write-files → swap-CURRENT sequence. Without it
        two concurrent mutations both read manifest seq N and the second
        CURRENT swap silently drops the first commit's files (lost
        update). Readers never take it — snapshot isolation comes from
        the immutable manifests. Not re-entrant: only public mutation
        entry points acquire it."""
        table = self._table_dir(model)
        os.makedirs(table, exist_ok=True)
        if fcntl is None:  # pragma: no cover - non-POSIX: single-writer
            yield
            return
        fd = os.open(os.path.join(table, ".write.lock"), os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    def _current_manifest(self, model: ModelDefinition) -> dict:
        table = self._table_dir(model)
        pointer = os.path.join(table, "CURRENT")
        if not os.path.exists(pointer):
            return {"files": [], "stats": {}}
        with open(pointer, encoding="utf-8") as fh:
            name = fh.read().strip()
        with open(os.path.join(table, name), encoding="utf-8") as fh:
            return json.load(fh)

    def _commit(
        self, model: ModelDefinition, manifest: dict, op: str = "rewrite"
    ) -> None:
        """Atomic snapshot swap: write manifest, then os.replace the
        CURRENT pointer (atomic on POSIX). Manifests are numbered, kept,
        and readable via ``read_df(model, at=seq)`` (time travel) until
        ``expire_snapshots`` drops them.

        ``op`` records the commit's provenance for change-feed pruning:
        'insert'  — new files contain ONLY records absent from the
                    previous snapshot (create_many / append_df);
        'layout'  — new files contain ONLY records present in the
                    previous snapshot, rearranged (compact / z-order);
        'rewrite' — anything else (update/delete/merge/migrate); a
                    consumer must diff against the previous snapshot.
        """
        manifest["op"] = op
        table = self._table_dir(model)
        os.makedirs(table, exist_ok=True)
        seq = manifest["seq"] = self._current_manifest(model).get("seq", 0) + 1
        name = f"manifest-{seq:08d}-{uuid.uuid4().hex}.json"
        with open(os.path.join(table, name), "w", encoding="utf-8") as fh:
            json.dump(manifest, fh)
        tmp = os.path.join(table, f".CURRENT.{uuid.uuid4().hex}")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(name)
        os.replace(tmp, os.path.join(table, "CURRENT"))

    # ------------------------------------------------------------------ io
    def _write_data_file(self, df: DataFrame, model: ModelDefinition) -> list[dict]:
        """Write df as parquet under the table dir; return file entries
        with per-file pk min/max stats for manifest-level pruning."""
        table = self._table_dir(model)
        os.makedirs(table, exist_ok=True)
        out = os.path.join(table, f"data-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(out)
        pk = model.primary_key
        entries = []
        for fname in sorted(os.listdir(out)):
            if not fname.endswith(".parquet"):
                continue
            path = os.path.join(out, fname)
            stats = (
                self.spark.read.parquet(path)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.min(pk).alias("lo"),
                    F.max(pk).alias("hi"),
                )
                .first()
            )
            if stats["n"] == 0:
                # a zero-row file has no stats, so _contains would treat
                # it as must-scan forever; never manifest it
                continue
            entries.append(
                {
                    "path": path,
                    "lo": stats["lo"],
                    "hi": stats["hi"],
                    "rows": stats["n"],
                }
            )
        return entries

    def read_df(
        self, model: ModelDefinition, at: int | None = None
    ) -> DataFrame:
        """A snapshot as a DataFrame (empty if never written).

        ``at`` time-travels to a historical snapshot by its sequence
        number (see ``history``); default is the current snapshot.
        """
        if at is None:
            manifest = self._current_manifest(model)
        else:
            matches = [n for s, n in self.history(model) if s == at]
            if not matches:
                raise StorageError(
                    f"no snapshot {at} for {model.model_name}; "
                    f"have {[s for s, _ in self.history(model)]}"
                )
            with open(
                os.path.join(self._table_dir(model), matches[0]),
                encoding="utf-8",
            ) as fh:
                manifest = json.load(fh)
        files = [f["path"] for f in manifest["files"]]
        if not files:
            return self.spark.createDataFrame([], model.to_struct_type())
        return self.spark.read.schema(model.to_struct_type()).parquet(*files)

    def history(self, model: ModelDefinition) -> list[tuple[int, str]]:
        """Committed snapshots as (seq, manifest_name), oldest first."""
        table = self._table_dir(model)
        if not os.path.isdir(table):
            return []
        out = []
        for entry in os.listdir(table):
            if entry.startswith("manifest-") and entry.endswith(".json"):
                try:
                    out.append((int(entry.split("-")[1]), entry))
                except (IndexError, ValueError):
                    continue
        return sorted(out)

    def expire_snapshots(self, model: ModelDefinition, keep: int = 1) -> None:
        """Drop all but the newest ``keep`` snapshots, then GC data files
        no remaining manifest references (the Iceberg-style maintenance
        pair to ``compact``)."""
        with self._write_lock(model):
            history = self.history(model)
            for _seq, name in history[:-keep] if keep else history:
                current = self._current_pointer(model)
                if name != current:
                    os.remove(os.path.join(self._table_dir(model), name))
            self._gc(model)

    def _records_to_df(
        self, records: Iterable[dict], model: ModelDefinition
    ) -> DataFrame:
        rows = [tuple(r.get(f) for f in model.field_order) for r in records]
        return self.spark.createDataFrame(rows, model.to_struct_type())

    # ------------------------------------------------------------------ CRUD
    def create_one(self, model: ModelDefinition, body: str | dict) -> dict:
        """Validate + insert; duplicate pk is an error (json/mod.rs:84-96)."""
        return self.create_many(model, [body])[0]

    def create_many(
        self, model: ModelDefinition, bodies: Iterable[str | dict]
    ) -> list[dict]:
        """Batch insert: one delta file + one manifest commit for N rows."""
        records = [parse_record(b, model) for b in bodies]
        if not records:  # avoid committing a stat-less empty delta file
            return []
        pk = model.primary_key
        keys = [r[pk] for r in records]
        if len(set(keys)) != len(keys):
            raise DuplicateKeyError("duplicate primary keys within batch")
        with self._write_lock(model):
            existing = self.read_df(model)
            # dup check = semi-join against the new keys; at scale this
            # prunes to files whose [lo,hi] overlaps the inserted keys.
            clash = existing.filter(F.col(pk).isin(keys)).limit(1).collect()
            if clash:
                raise DuplicateKeyError(
                    f"record with primary key already exists, use PUT to"
                    f" update (key={clash[0][pk]!r})"
                )
            manifest = self._current_manifest(model)
            new_files = self._write_data_file(
                self._records_to_df(records, model), model
            )
            manifest["files"] = manifest["files"] + new_files
            self._commit(model, manifest, op="insert")
        return records

    def read_one(self, model: ModelDefinition, id_str: str) -> dict:
        """Point lookup by pk (json/mod.rs:97-105): manifest min/max
        pruning + parquet predicate pushdown, then hash-probe."""
        key = parse_uri_id(id_str, model)
        manifest = self._current_manifest(model)
        candidates = [
            f["path"]
            for f in manifest["files"]
            if f["lo"] is None or _contains(f, key)
        ]
        if not candidates:
            raise NotFoundError(
                f"no {model.model_name} with {model.primary_key}={id_str}"
            )
        df = self.spark.read.schema(model.to_struct_type()).parquet(*candidates)
        row = df.filter(F.col(model.primary_key) == F.lit(key)).first()
        if row is None:
            raise NotFoundError(
                f"no {model.model_name} with {model.primary_key}={id_str}"
            )
        return add_null_values(row.asDict(), model)

    def update_one(
        self, model: ModelDefinition, id_str: str, body: str | dict
    ) -> dict:
        """Patch semantics (model.rs:68-89): only supplied attrs change;
        pk comes from the URI — a pk in the body is ignored/overwritten
        (model.rs:85-86). Re-parses with the reference's two-pass trick so
        required-ness is enforced only for supplied attrs (model.rs:73-84).
        """
        key = parse_uri_id(id_str, model)
        supplied = parse_record(body, model, required=[])
        raw = body if isinstance(body, dict) else json.loads(body)
        patch_attrs = [a for a in raw if a in model.attributes]
        # required check over supplied attrs only
        parse_record(
            raw,
            model,
            required=[a for a in model.required if a in raw],
        )
        with self._write_lock(model):
            stored = self.read_one(model, id_str)  # NotFoundError if absent
            merged = dict(stored)
            for attr in patch_attrs:
                merged[attr] = supplied[attr]
            merged[model.primary_key] = key  # URI wins (model.rs:85-86)
            self._rewrite_key(model, key, replacement=merged)
        return add_null_values(merged, model)

    def delete_one(self, model: ModelDefinition, id_str: str) -> dict:
        """Remove by pk and return the removed record (json/mod.rs:126-138)."""
        key = parse_uri_id(id_str, model)
        with self._write_lock(model):
            stored = self.read_one(model, id_str)
            self._rewrite_key(model, key, replacement=None)
        return stored

    def _rewrite_key(
        self, model: ModelDefinition, key: Any, replacement: dict | None
    ) -> None:
        """Rewrite only the data files whose pk range may contain ``key``;
        untouched files carry over into the new manifest by reference."""
        manifest = self._current_manifest(model)
        keep = [f for f in manifest["files"] if not _contains(f, key)]
        touched = [f for f in manifest["files"] if _contains(f, key)]
        new_files = list(keep)
        if touched:
            df = self.spark.read.schema(model.to_struct_type()).parquet(
                *[f["path"] for f in touched]
            )
            remain = df.filter(F.col(model.primary_key) != F.lit(key))
            if replacement is not None:
                remain = remain.unionByName(
                    self._records_to_df([replacement], model)
                )
            if remain.limit(1).collect():
                new_files += self._write_data_file(remain, model)
        elif replacement is not None:
            new_files += self._write_data_file(
                self._records_to_df([replacement], model), model
            )
        manifest["files"] = new_files
        self._commit(model, manifest)
        self._gc(model)

    def upsert_many(
        self, model: ModelDefinition, bodies: Iterable[str | dict]
    ) -> list[dict]:
        """Batch MERGE (full-record upsert): new keys insert, existing
        keys are replaced — one atomic snapshot commit."""
        records = [parse_record(b, model) for b in bodies]
        return self.apply_changes(model, upserts=records)

    def apply_changes(
        self,
        model: ModelDefinition,
        upserts: list[dict] | None = None,
        deletes: list[Any] | None = None,
    ) -> list[dict]:
        """CDC apply: upserts + deletes in ONE commit (the Delta
        ``MERGE WHEN MATCHED/NOT MATCHED`` shape).

        Only data files whose pk [min,max] range overlaps an affected
        key are rewritten; all others carry into the new manifest by
        reference — at scale a batch touching one key range rewrites
        one file out of millions. ``upserts`` must be pre-validated
        records (``parse_record`` output).
        """
        upserts = list(upserts or [])
        deletes = list(deletes or [])
        if not upserts and not deletes:
            return []
        pk = model.primary_key
        keys = [r[pk] for r in upserts] + deletes
        if len(set(keys)) != len(keys):
            raise DuplicateKeyError("conflicting keys within change batch")
        with self._write_lock(model):
            manifest = self._current_manifest(model)
            touched = [
                f
                for f in manifest["files"]
                if any(_contains(f, k) for k in keys)
            ]
            keep = [f for f in manifest["files"] if f not in touched]
            new_files = list(keep)
            survivors = None
            if touched:
                df = self.spark.read.schema(model.to_struct_type()).parquet(
                    *[f["path"] for f in touched]
                )
                survivors = df.filter(~F.col(pk).isin(keys))
            if upserts:
                fresh = self._records_to_df(upserts, model)
                survivors = (
                    fresh if survivors is None else survivors.unionByName(fresh)
                )
            if survivors is not None:
                new_files += self._write_data_file(survivors, model)
            manifest["files"] = new_files
            self._commit(model, manifest)
        return upserts

    def append_df(
        self,
        model: ModelDefinition,
        df: DataFrame,
        _locked: bool = False,
        keys_are_new: bool = False,
    ) -> int:
        """Append a pre-validated DataFrame as delta files in one
        commit — the bulk-ingest fast path: no per-row Python, rows
        flow executor→parquet directly. Callers are responsible for
        validation and dup-checks (see sources.ingest.bulk_ingest);
        ``_locked=True`` means the caller already holds the table's
        write lock. Returns the number of rows appended.

        ``keys_are_new=True`` is a CONTRACT, not a hint: it commits
        with op='insert', which ChangeFeed.poll trusts to skip its
        anti-join against the previous snapshot — a caller that passes
        it without having proven pk-newness (as bulk_ingest's
        anti-join does) makes subscribers re-deliver existing keys as
        inserts. The default commits op='append' (key-newness
        unproven), which keeps the feed on its conservative anti-join
        path at the cost of one snapshot pk scan per delivered delta."""
        if _locked:
            return self._append_df_locked(model, df, keys_are_new)
        with self._write_lock(model):
            return self._append_df_locked(model, df, keys_are_new)

    def _append_df_locked(
        self, model: ModelDefinition, df: DataFrame, keys_are_new: bool = False
    ) -> int:
        manifest = self._current_manifest(model)
        new_files = self._write_data_file(
            df.select(*model.field_order), model
        )
        if not new_files:
            return 0
        manifest["files"] = manifest["files"] + new_files
        self._commit(model, manifest,
                     op="insert" if keys_are_new else "append")
        return sum(f["rows"] for f in new_files)

    # ------------------------------------------------------------ maintenance
    def compact(self, model: ModelDefinition, target_files: int = 1) -> None:
        """Fold delta files into ``target_files`` pk-range-partitioned,
        pk-sorted files.

        Range partitioning (not round-robin) is the point: every
        compacted file covers a DISJOINT pk interval, so the manifest's
        per-file [lo, hi] stats prune a point lookup to exactly one
        file — after arbitrary CRUD churn, reads are back to O(one
        file). Sorting within each file additionally tightens parquet
        row-group stats so the scan skips pages inside that file too.
        """
        with self._write_lock(model):
            pk = model.primary_key
            df = (
                self.read_df(model)
                .repartitionByRange(target_files, pk)
                .sortWithinPartitions(pk)
            )
            new_files = self._write_data_file(df, model)
            manifest = self._current_manifest(model)
            manifest["files"] = new_files
            self._commit(model, manifest, op="layout")
            self._gc(model)

    def table_health(self, model: ModelDefinition) -> dict:
        """Manifest-derived layout health, computed WITHOUT touching
        data files (metadata only — safe to poll):

        - ``n_files`` / ``n_rows``: current snapshot size;
        - ``overlap_fraction``: share of files whose pk range overlaps
          the previous file's in lo-sorted order — 0.0 right after
          ``compact`` (disjoint ranges), approaching 1.0 as CRUD churn
          accumulates deltas that all straddle each other, which is
          exactly when point lookups stop pruning;
        - ``n_snapshots``: retained manifests (time-travel state that
          ``expire_snapshots`` trims).
        """
        manifest = self._current_manifest(model)
        files = manifest["files"]
        spans = sorted(
            ((f["lo"], f["hi"]) for f in files if f["lo"] is not None),
        )
        overlapping = sum(
            1
            for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:])
            if lo_next <= hi_prev
        )
        return {
            "n_files": len(files),
            "n_rows": sum(f.get("rows", 0) for f in files),
            "overlap_fraction": (
                overlapping / (len(spans) - 1) if len(spans) > 1 else 0.0
            ),
            "n_snapshots": len(self.history(model)),
        }

    def maintain(
        self,
        model: ModelDefinition,
        max_files: int = 16,
        max_overlap: float = 0.25,
        keep_snapshots: int = 3,
        target_files: int = 4,
    ) -> dict:
        """The auto-OPTIMIZE loop a deployment schedules: read health
        (metadata only), compact when the layout has degraded past the
        thresholds (too many files OR overlapping pk ranges), then trim
        snapshot history. A healthy table is a cheap no-op — one
        manifest read — so this can run after every N commits or on a
        timer without thinking. Returns the health plus the actions
        taken."""
        health = self.table_health(model)
        compacted = health["n_files"] > max_files or (
            health["overlap_fraction"] > max_overlap and health["n_files"] > 1
        )
        if compacted:
            self.compact(model, target_files=target_files)
        expired = health["n_snapshots"] > keep_snapshots
        if expired:
            self.expire_snapshots(model, keep=keep_snapshots)
        return {**health, "compacted": compacted, "expired": expired}

    def _current_pointer(self, model: ModelDefinition) -> str | None:
        pointer = os.path.join(self._table_dir(model), "CURRENT")
        if not os.path.exists(pointer):
            return None
        with open(pointer, encoding="utf-8") as fh:
            return fh.read().strip()

    def _gc(self, model: ModelDefinition) -> None:
        """Remove data dirs referenced by NO retained manifest (history
        is retained for time travel until expire_snapshots drops it)."""
        table = self._table_dir(model)
        live: set[str] = set()
        for _seq, name in self.history(model):
            with open(os.path.join(table, name), encoding="utf-8") as fh:
                for f in json.load(fh)["files"]:
                    live.add(os.path.dirname(f["path"]))
        for entry in os.listdir(table):
            path = os.path.join(table, entry)
            if entry.startswith("data-") and path not in live:
                shutil.rmtree(path, ignore_errors=True)

    def count(self, model: ModelDefinition) -> int:
        return self.read_df(model).count()


def _contains(file_entry: dict, key: Any) -> bool:
    lo, hi = file_entry.get("lo"), file_entry.get("hi")
    if lo is None or hi is None:
        return True  # no stats -> must scan
    try:
        return lo <= key <= hi
    except TypeError:
        raise StorageError(
            f"pk {key!r} not comparable with file stats [{lo!r}, {hi!r}]"
        ) from None
