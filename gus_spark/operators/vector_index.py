"""Persisted IVF-PQ vector index: fit once, encode incrementally,
search forever — the index lifecycle that makes ANN viable at corpus
scale, where re-fitting or re-encoding per query is the thing you can
never afford.

The MinHashIndex pattern (operators/dedup.py) applied to similarity:
the fitted model (Lloyd centroids + residual codebooks, <1 MB) persists
as .npy files; encoded rows (cell + m codes + reconstruction norm, ~25
bytes/vector vs 256 for raw float32) persist as an append-only parquet
table. Arriving batches encode against the FROZEN model — encoding is
deterministic, so incremental adds are bit-identical to a one-shot
encode of the same rows (asserted in tests), and a search touches only
nprobe/cells of the code bytes plus the shortlisted rows' full vectors
for the exact re-rank.

Freezing the quantizer is the standard production trade (FAISS trains
on a sample, then add() forever): drift in the vector distribution
degrades cell balance, not correctness — ``stats()`` exposes occupancy
so an operator can decide when to re-fit and re-encode.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from gus_spark.errors import StorageError
from gus_spark.operators.quantization import (
    IvfPqModel,
    ivf_pq_encode,
    ivf_pq_fit,
    ivf_pq_shortlist,
    ivf_pq_topk,
)


def _parquet_rows(path: str) -> int:
    """Row count of every parquet file under ``path`` from footer
    metadata only — no Spark job, no data read."""
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


class VectorIndex:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        m: int = 16,
        codes: int = 256,
        iters: int = 3,
    ):
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.vec_col = vec_col
        os.makedirs(path, exist_ok=True)
        meta_path = os.path.join(path, "meta.json")
        meta = {"m": m, "codes": codes, "iters": iters}
        if os.path.exists(meta_path):
            with open(meta_path, encoding="utf-8") as fh:
                existing = json.load(fh)
            if existing != meta:
                raise ValueError(
                    f"index at {path} was built with {existing}, got {meta}"
                )
        else:
            with open(meta_path, "w", encoding="utf-8") as fh:
                json.dump(meta, fh)
        self.m, self.codes, self.iters = m, codes, iters

    # ------------------------------------------------------------ model io
    def _model_paths(self) -> tuple[str, str]:
        return (
            os.path.join(self.path, "centroids.npy"),
            os.path.join(self.path, "codebooks.npy"),
        )

    def _codes_path(self) -> str:
        return os.path.join(self.path, "codes")

    @property
    def fitted(self) -> bool:
        return all(os.path.exists(p) for p in self._model_paths())

    def _load_model(self) -> IvfPqModel:
        if not self.fitted:
            raise StorageError(f"index at {self.path} is not fitted")
        cpath, bpath = self._model_paths()
        return IvfPqModel(np.load(cpath), np.load(bpath))

    # ------------------------------------------------------------ lifecycle
    def fit(self, df: DataFrame, seed_col: str | None = "label") -> None:
        """Train and persist the quantizer (NOT the codes — call
        ``add`` for every batch, including the training one). Refusing
        to silently re-fit keeps encoded rows consistent: a new fit on
        an index holding codes would orphan them."""
        if os.path.isdir(self._codes_path()):
            raise StorageError(
                f"index at {self.path} already holds encoded rows; "
                "re-fitting would orphan them (build a new index)"
            )
        model = ivf_pq_fit(
            df, id_col=self.id_col, vec_col=self.vec_col, seed_col=seed_col,
            m=self.m, codes=self.codes, iters=self.iters,
        )
        cpath, bpath = self._model_paths()
        np.save(cpath, model.centroids)
        np.save(bpath, model.codebooks)

    def _read_codes(self) -> DataFrame:
        # codes live in per-add delta directories (idempotent replay
        # unit); recursiveFileLookup reads them all without inferring
        # partition columns from the directory names
        return (
            self.spark.read.option("recursiveFileLookup", "true")
            .parquet(self._codes_path())
        )

    def add(self, batch: DataFrame, batch_key: str | None = None) -> int:
        """Encode ``batch`` against the frozen model and append its
        codes as one delta directory. Returns rows added. O(batch) —
        the existing corpus is never read, let alone re-encoded.

        ``batch_key`` makes the append IDEMPOTENT: the delta directory
        is named by the key and written with overwrite semantics, so a
        crash-replay of the same batch (streaming foreachBatch re-runs
        after a failure between sink write and checkpoint commit)
        replaces its own earlier output instead of duplicating rows.
        Without a key a fresh unique delta is written.
        """
        import uuid

        model = self._load_model()
        enc = ivf_pq_encode(
            batch, model, id_col=self.id_col, vec_col=self.vec_col
        )
        key = batch_key if batch_key is not None else uuid.uuid4().hex
        dest = os.path.join(self._codes_path(), f"delta-{key}")
        enc.write.mode("overwrite").parquet(dest)
        # row count from the written files' parquet footers — the Arrow
        # encode kernel runs exactly once (the write); a .count() on enc
        # would re-execute the whole encode a second time
        return _parquet_rows(dest)

    def search(
        self,
        queries: list[tuple[int, list[float]]],
        k: int = 10,
        nprobe: int = 4,
        shortlist: int | None = None,
        rerank_df: DataFrame | None = None,
    ) -> DataFrame:
        """ADC search over the persisted codes. With ``rerank_df`` (the
        full-vector table) the shortlist is exactly re-ranked — the
        two-stage production path; without it, ADC scores rank directly
        (columns adc_sim instead of cos_sim)."""
        model = self._load_model()
        encoded = self._read_codes()
        if rerank_df is not None:
            return ivf_pq_topk(
                rerank_df, encoded, queries, model, k=k, nprobe=nprobe,
                shortlist=shortlist, id_col=self.id_col, vec_col=self.vec_col,
            )
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        sl = ivf_pq_shortlist(encoded, queries, model, k=shortlist or 5 * k,
                              nprobe=nprobe)
        # collapse duplicate candidates (e.g. the same id added twice)
        # BEFORE ranking — otherwise a duplicate occupies two ranks and
        # evicts a legitimate neighbor from the top k. Same key as the
        # ranking window, so AQE plans a single query_id exchange.
        sl = sl.dropDuplicates(["query_id", "neighbor_id"])
        w = Window.partitionBy("query_id").orderBy(
            F.desc("adc_sim"), "neighbor_id"
        )
        return (
            sl.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "adc_sim",
                    F.col("rank").cast("long").alias("rank"))
        )

    # ------------------------------------------------------------ maintenance
    def health(self) -> dict:
        """Codes-table layout health from filesystem metadata only (no
        Spark job) — the VectorIndex twin of ParquetStore.table_health."""
        from gus_spark.storage.deltas import count_parquet_files

        base = self._codes_path()
        if not os.path.isdir(base):
            return {"n_files": 0, "n_deltas": 0}
        return {
            "n_files": count_parquet_files(base),
            "n_deltas": sum(
                1 for d in os.listdir(base) if d.startswith("delta-")
            ),
        }

    def maintain(self, max_files: int = 16, target_files: int = 4) -> dict:
        """Compact the per-add code deltas once they exceed
        ``max_files`` — streaming ingest appends one delta per
        micro-batch, which unchecked is small-file death. Compacted
        output is range-partitioned AND sorted on ``cell`` so a search's
        nprobe cell filter prunes to the files/row-groups holding those
        cells. A healthy table is a metadata-only no-op, so this can
        run on a timer like ParquetStore.maintain. Search results are
        unchanged: the codes row set is identical, and every consumer
        is order-independent."""
        from gus_spark.storage.deltas import compact_deltas

        health = self.health()
        compacted = health["n_files"] > max_files
        if compacted:
            compact_deltas(
                self.spark, self._codes_path(), target_files,
                range_cols=["cell"],
            )
        return {"before": health, "compacted": compacted,
                "after": self.health()}

    def stats(self) -> dict:
        """Index health: total rows + per-cell occupancy spread (a
        drifting corpus skews cells; re-fit when the ratio degrades)."""
        from pyspark.sql import functions as F

        if not os.path.isdir(self._codes_path()):
            return {"n_rows": 0, "n_cells": 0, "max_cell_fraction": 0.0}
        enc = self._read_codes()
        per_cell = enc.groupBy("cell").count().collect()
        total = sum(r["count"] for r in per_cell)
        return {
            "n_rows": total,
            "n_cells": len(per_cell),
            "max_cell_fraction": (
                max(r["count"] for r in per_cell) / total if total else 0.0
            ),
        }
