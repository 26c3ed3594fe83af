"""CRUD round-trips on the parquet store — ports the storage-handler tests
(src/cli/server/model/storage_handler/json/mod.rs:144-325) plus the HTTP
integration semantics (src/cli/server.rs:272-464)."""

import pytest

from gus_spark.errors import DuplicateKeyError, NotFoundError
from gus_spark.model.types import ModelDefinition
from gus_spark.storage.parquet_store import ParquetStore

RECORD = {
    "id": 1,
    "name": "Natural Born Killers",
    "year": 1994,
    "actors": ["Woody Harrelson", "Juliette Lewis"],
    "recommended": True,
}


@pytest.fixture()
def store(spark, tmp_path):
    return ParquetStore(spark, str(tmp_path / "warehouse"))


def test_create_and_read(store, movie_model):  # json/mod.rs:218-243, 245-269
    created = store.create_one(movie_model, RECORD)
    assert created["name"] == RECORD["name"]
    got = store.read_one(movie_model, "1")
    assert got == {
        "id": 1,
        "actors": ["Woody Harrelson", "Juliette Lewis"],
        "name": "Natural Born Killers",
        "recommended": True,
        "year": 1994,
    }


def test_duplicate_create_rejected(store, movie_model):  # json/mod.rs:88-90
    store.create_one(movie_model, RECORD)
    with pytest.raises(DuplicateKeyError):
        store.create_one(movie_model, RECORD)


def test_read_missing(store, movie_model):  # json/mod.rs:103
    with pytest.raises(NotFoundError):
        store.read_one(movie_model, "99")
    store.create_one(movie_model, RECORD)
    with pytest.raises(NotFoundError):
        store.read_one(movie_model, "99")


def test_update_patch_semantics(store, movie_model):  # model.rs:68-89
    store.create_one(movie_model, RECORD)
    updated = store.update_one(movie_model, "1", {"year": 2000})
    assert updated["year"] == 2000
    assert updated["name"] == RECORD["name"]          # untouched attr kept
    got = store.read_one(movie_model, "1")
    assert got["year"] == 2000 and got["actors"] == RECORD["actors"]


def test_update_pk_in_body_ignored(store, movie_model):  # model.rs:85-86
    store.create_one(movie_model, RECORD)
    updated = store.update_one(movie_model, "1", {"id": 42, "year": 2001})
    assert updated["id"] == 1  # "id doesn't matter" (server.rs:393-398)
    assert store.read_one(movie_model, "1")["year"] == 2001
    with pytest.raises(NotFoundError):
        store.read_one(movie_model, "42")


def test_update_missing(store, movie_model):  # json/mod.rs:117
    with pytest.raises(NotFoundError):
        store.update_one(movie_model, "1", {"year": 2000})


def test_update_null_clears_optional(store, movie_model):
    store.create_one(movie_model, RECORD)
    updated = store.update_one(movie_model, "1", {"year": None})
    assert updated["year"] is None


def test_delete_returns_record(store, movie_model):  # json/mod.rs:126-138
    store.create_one(movie_model, RECORD)
    removed = store.delete_one(movie_model, "1")
    assert removed["name"] == RECORD["name"]
    with pytest.raises(NotFoundError):
        store.read_one(movie_model, "1")
    with pytest.raises(NotFoundError):
        store.delete_one(movie_model, "1")  # json/mod.rs:131-133


def test_string_pk_roundtrip(store):  # json/mod.rs:257; server movie.json
    model = ModelDefinition.from_json(
        {
            "model_name": "book",
            "attributes": {"id": "String", "title": "String"},
            "primary_key": "id",
            "required": ["id"],
        }
    )
    store.create_one(model, {"id": "get", "title": "t"})
    assert store.read_one(model, "get")["id"] == "get"
    store.delete_one(model, "get")


def test_boolean_pk_roundtrip(store):  # json/mod.rs:283-312
    model = ModelDefinition.from_json(
        {
            "model_name": "flag",
            "attributes": {"id": "Boolean", "note": "String"},
            "primary_key": "id",
            "required": ["id"],
        }
    )
    store.create_one(model, {"id": True, "note": "yes"})
    assert store.read_one(model, "true")["note"] == "yes"


def test_batch_insert_and_compact(store, movie_model):
    store.create_many(
        movie_model,
        [dict(RECORD, id=i, name=f"m{i}") for i in range(2, 12)],
    )
    store.create_one(movie_model, RECORD)
    assert store.count(movie_model) == 11
    store.compact(movie_model)
    assert store.count(movie_model) == 11
    assert store.read_one(movie_model, "5")["name"] == "m5"


def test_multiple_snapshots_isolated(store, movie_model):
    store.create_one(movie_model, RECORD)
    df_before = store.read_df(movie_model)
    store.create_one(movie_model, dict(RECORD, id=2))
    # the previously-resolved snapshot still reads consistently
    assert df_before.count() == 1
    assert store.count(movie_model) == 2


def test_time_travel_and_expiry(store, movie_model):
    store.create_one(movie_model, RECORD)                     # snapshot 1
    store.create_one(movie_model, dict(RECORD, id=2))         # snapshot 2
    store.delete_one(movie_model, "1")                        # snapshot 3
    history = store.history(movie_model)
    assert [s for s, _ in history] == [1, 2, 3]
    assert store.read_df(movie_model, at=1).count() == 1
    assert store.read_df(movie_model, at=2).count() == 2
    assert store.read_df(movie_model).count() == 1            # current
    store.expire_snapshots(movie_model, keep=1)
    assert len(store.history(movie_model)) == 1
    assert store.read_df(movie_model).count() == 1            # still reads
    import pytest as _pytest

    from gus_spark.errors import StorageError

    with _pytest.raises(StorageError):
        store.read_df(movie_model, at=1)


def test_get_handler_dispatch(spark, tmp_path):
    from gus_spark.errors import StorageError
    from gus_spark.storage.handler import get_handler
    from gus_spark.storage.json_store import JsonFileStore

    pq_model = ModelDefinition.from_json(
        {
            "model_name": "movie",
            "attributes": {"id": "Integer"},
            "primary_key": "id",
            "required": ["id"],
        }
    )
    js_model = ModelDefinition.from_json(
        {
            "model_name": "book",
            "storage_type": "json",
            "attributes": {"id": "Integer"},
            "primary_key": "id",
            "required": ["id"],
        }
    )
    config = {"json": {"storage_file": str(tmp_path / "x.json.gus")}}
    assert isinstance(get_handler(spark, pq_model), ParquetStore)
    handler = get_handler(spark, js_model, config)
    assert isinstance(handler, JsonFileStore)
    assert handler.storage_file == config["json"]["storage_file"]
    # unknown storage types are rejected at model load
    # (fixture invalid_storage.json, storage_handler.rs:40-42)
    from gus_spark.errors import ModelValidationError

    with pytest.raises(ModelValidationError):
        ModelDefinition.from_json(
            {
                "model_name": "card",
                "storage_type": "mongodb",
                "attributes": {"id": "Integer"},
                "primary_key": "id",
                "required": ["id"],
            }
        )
    # and defensively at dispatch for hand-built definitions
    bad = ModelDefinition(
        model_name="card",
        attributes=pq_model.attributes,
        primary_key="id",
        required=["id"],
        storage_type="mongodb",
    )
    with pytest.raises(StorageError):
        get_handler(spark, bad)


def test_upsert_many_insert_and_replace(store, movie_model):
    store.create_many(
        movie_model, [dict(RECORD, id=i, name=f"m{i}") for i in (1, 2, 3)]
    )
    store.upsert_many(
        movie_model,
        [dict(RECORD, id=2, name="replaced"), dict(RECORD, id=9, name="new")],
    )
    assert store.count(movie_model) == 4
    assert store.read_one(movie_model, "2")["name"] == "replaced"
    assert store.read_one(movie_model, "9")["name"] == "new"
    assert store.read_one(movie_model, "1")["name"] == "m1"


def test_apply_changes_single_commit(store, movie_model):
    store.create_many(
        movie_model, [dict(RECORD, id=i, name=f"m{i}") for i in (1, 2, 3)]
    )
    before = store.history(movie_model)[-1][0]
    store.apply_changes(
        movie_model,
        upserts=[
            {k: v for k, v in dict(RECORD, id=4, name="ins").items()}
        ],
        deletes=[1],
    )
    history = store.history(movie_model)
    assert history[-1][0] == before + 1  # exactly one new snapshot
    assert store.count(movie_model) == 3
    with pytest.raises(NotFoundError):
        store.read_one(movie_model, "1")
    assert store.read_one(movie_model, "4")["name"] == "ins"
    # time travel still shows the pre-merge state
    assert store.read_df(movie_model, at=before).count() == 3


def test_apply_changes_conflicting_keys(store, movie_model):
    store.create_one(movie_model, RECORD)
    with pytest.raises(DuplicateKeyError):
        store.apply_changes(
            movie_model, upserts=[dict(RECORD, id=5)], deletes=[5]
        )


def test_empty_create_many_is_noop(store, movie_model):
    """An empty batch must not commit a stat-less empty delta file that
    every later lookup would scan forever."""
    assert store.create_many(movie_model, []) == []
    assert store.history(movie_model) == []  # no manifest committed
    store.create_one(movie_model, RECORD)
    manifest = store._current_manifest(movie_model)
    assert all(f["lo"] is not None for f in manifest["files"])


def test_concurrent_writers_no_lost_update(store, movie_model):
    """Two threads inserting disjoint batches must both survive: the
    per-table writer lock serializes read-manifest -> write -> swap
    (without it, last-writer-wins drops one commit's files)."""
    import threading

    errors = []

    def insert(lo: int):
        try:
            store.create_many(
                movie_model,
                [dict(RECORD, id=i, name=f"m{i}") for i in range(lo, lo + 5)],
            )
        except Exception as e:  # pragma: no cover - failure detail
            errors.append(e)

    threads = [threading.Thread(target=insert, args=(lo,)) for lo in (100, 200)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert store.count(movie_model) == 10


def test_compact_produces_disjoint_pk_ranges(store, movie_model):
    """Compaction must leave pk-range-partitioned files: every file's
    manifest [lo, hi] interval is disjoint, so a point lookup prunes to
    EXACTLY one candidate file — the whole point of compacting after
    CRUD churn leaves overlapping deltas behind."""
    store.create_many(
        movie_model,
        [dict(RECORD, id=i, name=f"m{i}") for i in range(1, 41)],
    )
    # churn: updates + deletes leave overlapping delta files behind
    store.update_one(movie_model, "7", {"name": "patched"})
    store.delete_one(movie_model, "13")
    store.compact(movie_model, target_files=4)

    files = store._current_manifest(movie_model)["files"]
    assert len(files) == 4
    spans = sorted((f["lo"], f["hi"]) for f in files)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev < lo_next, f"overlapping compacted files: {spans}"
    # point lookup now has exactly one candidate file
    for key in (1, 7, 25, 40):
        assert sum(1 for f in files if f["lo"] <= key <= f["hi"]) == 1
    assert store.count(movie_model) == 39
    assert store.read_one(movie_model, "7")["name"] == "patched"


def test_maintain_compacts_only_when_degraded(store, movie_model):
    """The auto-OPTIMIZE loop: churn degrades the manifest (overlapping
    delta ranges), maintain() detects it from metadata alone and
    compacts + trims history; a second maintain() on the now-healthy
    table is a no-op (manifest seq unchanged by compaction)."""
    store.create_many(
        movie_model,
        [dict(RECORD, id=i, name=f"m{i}") for i in range(1, 31)],
    )
    # churn: each update rewrites a wide-range file -> overlapping spans
    for key in ("5", "15", "25"):
        store.update_one(movie_model, key, {"name": "patched"})
    before = store.table_health(movie_model)
    assert before["overlap_fraction"] > 0.25, before

    report = store.maintain(movie_model, keep_snapshots=2)
    assert report["compacted"] is True
    after = store.table_health(movie_model)
    assert after["overlap_fraction"] == 0.0, after
    assert after["n_snapshots"] <= 3  # 2 kept + the compaction commit

    seq_before = store._current_manifest(movie_model)["seq"]
    report2 = store.maintain(movie_model, keep_snapshots=2)
    assert report2["compacted"] is False
    assert store._current_manifest(movie_model)["seq"] == seq_before
    assert store.count(movie_model) == 30
