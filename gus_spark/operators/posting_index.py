"""Live BM25 posting index: base + delta layout under an atomic
manifest snapshot — incremental maintenance for the inverted index
(ROADMAP r7 #4: "make the index a live table like VectorIndex").

`build_posting_index` (operators/retrieval.py) is the static-corpus
form: one atomic rebuild, full cost every time the corpus grows. This
module is the append-only form a streaming ingest needs. Layout, all
under one ``root`` directory:

- ``base-g<gen>/``   — the bucketed-by-term posting table (external
  table ``<name>_g<gen>`` in the session catalog, so query-term bucket
  pruning and the zero-exchange df-count keep working on the base);
- ``delta-<key>/``   — one small plain-parquet postings directory per
  ``add`` batch, written with publish-if-changed overwrite semantics
  (streaming.markers.publish_batch) so a crash-replay of the same
  batch key is file-idempotent;
- ``meta.json``      — the SNAPSHOT MANIFEST: current generation +
  base totals, the set of live delta keys with each delta's exact
  (n_docs, tok_sum), and every key ever folded by a compaction.
  Swapped with ``os.replace`` — readers resolve the manifest first,
  so every read sees one consistent (base, deltas) snapshot and a
  crash anywhere leaves only invisible orphans, never a half-state.

Why a manifest instead of the denormalized-stats trick the static
index uses: corpus stats (N, avgdl) change on EVERY append, so stats
carried on posting rows go stale the moment a delta lands — the
manifest holds exact integer totals per tier (base + each delta), and
serving derives avgdl from their sums in the same IEEE double division
the ad-hoc scan performs, keeping rankings bit-identical to
``bm25_topk`` over the equivalent full corpus (asserted in tests).

Serving cost at 100 TB: the base scan stays bucket-pruned to the query
terms' buckets and its per-term df-count completes WITHOUT an exchange
(bucketed groupBy); only the delta tier — small by the compaction
contract — pays a term-keyed shuffle, and the two tiny per-tier df
frames re-aggregate in an exchange of <= 2x|query| rows. The one
matched-row-scaled shuffle is the final per-doc sum, exactly as in the
ad-hoc path. ``compact()`` folds deltas into the next base generation
(full rewrite of the postings, the LSM bargain) and ``maintain()``
triggers it on a delta-count threshold, mirroring VectorIndex.

Append-only contract (as MinHashIndex/VectorIndex): every ``add`` must
carry NEW document ids. A re-added id would double its postings and
silently double-score — the one guard the index can afford cheaply is
the folded-key check: re-``add`` of a batch key that a compaction has
already folded into the base raises instead of double-counting (a
live delta key just republishes idempotently).

Reference surface: none — the reference engine has no search path;
this extends the SURVEY §2.3 training-data layer.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gus_spark.operators.retrieval import (
    B,
    K1,
    _query_terms,
    _score_postings,
    posting_lists,
)
from gus_spark.operators.dedup import tokenize
from gus_spark.streaming import markers

#: manifest layout generation — bump on any incompatible change so a
#: resumed writer fails loudly instead of misreading old state
LAYOUT = 1


def _corpus_totals(
    df: DataFrame, text_col: str
) -> tuple[int, int]:
    """(n_docs, tok_sum) as exact longs over non-null-text rows — the
    integer halves of retrieval.corpus_stats, so avgdl derived from
    their sums is the same double division the ad-hoc path computes."""
    row = df.filter(F.col(text_col).isNotNull()).agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.sum(F.size(tokenize(F.col(text_col))).cast("long")),
            F.lit(0).cast("long"),
        ).alias("s"),
    ).first()
    return int(row["n"]), int(row["s"])


class PostingIndex:
    """Persisted, incrementally-maintained BM25 index under ``root``.

    Lifecycle: ``build`` once on the starting corpus, ``add`` new-doc
    batches (directly or via streaming.postings.posting_index_stream),
    ``topk`` to serve, ``maintain``/``compact`` to fold deltas.
    Single-writer, many-reader — the same assumption every incremental
    index in this repo makes."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------- manifest
    @property
    def _meta_path(self) -> str:
        return os.path.join(self.root, "meta.json")

    def _read_meta(self) -> dict:
        if not os.path.exists(self._meta_path):
            raise ValueError(
                f"no posting index at {self.root!r} — call build() first"
            )
        with open(self._meta_path, encoding="utf-8") as fh:
            meta = json.load(fh)
        if meta.get("layout") != LAYOUT:
            raise ValueError(
                f"posting index at {self.root!r} uses layout "
                f"{meta.get('layout')}, this build reads {LAYOUT} — "
                "rebuild the index"
            )
        return meta

    def _write_meta(self, meta: dict) -> None:
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(meta, fh)
        os.replace(tmp, self._meta_path)  # the atomic snapshot swap

    @property
    def fitted(self) -> bool:
        return os.path.exists(self._meta_path)

    # ---------------------------------------------------------- build
    def build(
        self,
        df: DataFrame,
        name: str,
        n_buckets: int = 32,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> dict:
        """Full build from the starting corpus: bucketed base table at
        generation 0, empty delta set. ``name`` must be unique per
        index (generation tables are ``<name>_g<gen>`` in the session
        catalog). Rebuilding over an existing root starts a fresh
        lineage (old generations dropped)."""
        if self.fitted:
            old = self._read_meta()
            self._drop_generation(old)
            for key in old["deltas"]:
                shutil.rmtree(self._delta_path(key), ignore_errors=True)
        # a fresh lineage invalidates every streaming done-marker: the
        # marker's "output still holds this batch" promise refers to
        # deltas this build just wiped, and a fresh stream checkpoint
        # restarts batch ids at 0 — identical (id, fingerprint) pairs
        # would SKIP and silently never re-add those docs (round-8
        # review fix)
        for m in glob.glob(os.path.join(self.root, "_batch-*.done")):
            os.remove(m)
        post = posting_lists(df, id_col, text_col)
        n_docs, tok_sum = _corpus_totals(df, text_col)
        table = f"{name}_g0"
        self._write_base(post, table, 0, n_buckets)
        self._write_meta({
            "layout": LAYOUT,
            "name": name,
            "gen": 0,
            "table": table,
            "n_buckets": n_buckets,
            "id_col": id_col,
            "text_col": text_col,
            "schema_ddl": ", ".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in post.schema.fields
            ),
            "n_docs": n_docs,
            "tok_sum": tok_sum,
            "deltas": {},
            "folded": [],
        })
        return self.stats()

    def _base_path(self, gen: int) -> str:
        return os.path.join(self.root, f"base-g{gen}")

    def _delta_path(self, key: str) -> str:
        return os.path.join(self.root, f"delta-{key}")

    def _write_base(
        self, post: DataFrame, table: str, gen: int, n_buckets: int
    ) -> None:
        (
            post.write.mode("overwrite")
            .format("parquet")
            .bucketBy(n_buckets, "w")
            .sortBy("w")
            .option("path", self._base_path(gen))
            .saveAsTable(table)
        )

    def _drop_generation(self, meta: dict) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {meta['table']}")
        shutil.rmtree(self._base_path(meta["gen"]), ignore_errors=True)

    def _ensure_table(self, meta: dict) -> None:
        """Re-register the external base table in a fresh session's
        catalog (the files under root are the source of truth; the
        catalog entry is just how Spark learns the bucket layout)."""
        if self.spark.catalog.tableExists(meta["table"]):
            return
        self.spark.sql(
            f"CREATE TABLE {meta['table']} ({meta['schema_ddl']}) "
            f"USING parquet CLUSTERED BY (w) SORTED BY (w) "
            f"INTO {meta['n_buckets']} BUCKETS "
            f"LOCATION '{self._base_path(meta['gen'])}'"
        )

    # ------------------------------------------------------------ add
    def add(self, docs: DataFrame, batch_key: str | None = None) -> int:
        """Append one batch of NEW documents as a delta directory.
        O(batch): tokenizes only the new docs, never reads the corpus.
        Returns docs added. With ``batch_key`` the append is
        idempotent (publish-if-changed delta + manifest set-add); a
        key already folded by a compaction raises — replaying it would
        double-count rows the base already holds."""
        import uuid

        meta = self._read_meta()
        key = batch_key if batch_key is not None else uuid.uuid4().hex
        if key in meta["folded"]:
            raise ValueError(
                f"batch key {key!r} was already folded into base "
                f"generation {meta['gen']} of {self.root!r}: replaying "
                "it would double-count its postings. Use the streaming "
                "ingest's done-markers (streaming.postings) or a fresh "
                "key."
            )
        post = posting_lists(
            docs, meta["id_col"], meta["text_col"]
        )
        n_docs, tok_sum = _corpus_totals(docs, meta["text_col"])
        markers.publish_batch(post, self._delta_path(key))
        meta["deltas"][key] = {"n_docs": n_docs, "tok_sum": tok_sum}
        self._write_meta(meta)
        return n_docs

    # ---------------------------------------------------------- serve
    def topk(
        self, query: list[str], k: int, k1: float = K1, b: float = B
    ) -> DataFrame:
        """Top-k by BM25 over the current snapshot, bit-identical to
        ``bm25_topk`` over the equivalent full corpus. Base postings
        are bucket-pruned to the query terms and df-counted without an
        exchange; deltas pay one small term-keyed shuffle; the tier
        df-counts sum in a <= 2x|query|-row re-aggregation."""
        meta = self._read_meta()
        self._ensure_table(meta)
        terms = _query_terms(query)
        n_docs = meta["n_docs"] + sum(
            d["n_docs"] for d in meta["deltas"].values()
        )
        if n_docs == 0:
            raise ValueError(f"posting index at {self.root!r} is empty")
        tok_sum = meta["tok_sum"] + sum(
            d["tok_sum"] for d in meta["deltas"].values()
        )
        # the same IEEE double division corpus_stats performs — Python
        # floats ARE binary64, so the quotient is bit-identical
        avgdl = float(tok_sum) / float(n_docs)
        stats = self.spark.range(1).select(
            F.lit(n_docs).cast("long").alias("n_docs"),
            F.lit(avgdl).cast("double").alias("avgdl"),
        )
        base = self.spark.table(meta["table"]).filter(
            F.col("w").isin(terms)
        )
        id_col = meta["id_col"]
        tiers = [base]
        if meta["deltas"]:
            delta = self.spark.read.parquet(
                *[self._delta_path(kk) for kk in meta["deltas"]]
            ).filter(F.col("w").isin(terms))
            tiers.append(delta)
        # per-tier partial df (base side completes on the bucket
        # layout with no exchange), then the tiny re-aggregation
        partials = [
            t.groupBy("w").agg(F.count("*").alias("df")) for t in tiers
        ]
        dfreq = partials[0]
        for p in partials[1:]:
            dfreq = dfreq.unionByName(p)
        dfreq = dfreq.groupBy("w").agg(F.sum("df").alias("df"))
        post = tiers[0]
        for t in tiers[1:]:
            post = post.unionByName(t)
        return _score_postings(post, dfreq, stats, k, id_col, k1, b)

    # ----------------------------------------------------- compaction
    def compact(self) -> dict:
        """Fold every live delta into the next base generation: one
        bucketed rewrite of all postings, manifest swapped atomically
        to (gen+1, no deltas), then the old generation and delta dirs
        are removed. A crash before the swap leaves an orphan staging
        table readers never see; after it, orphan dirs the next
        compaction ignores. Folded keys are recorded forever so a
        late replay of a folded batch raises (see ``add``)."""
        meta = self._read_meta()
        self._ensure_table(meta)
        if not meta["deltas"]:
            return self.stats()
        all_post = self.spark.table(meta["table"])
        delta = self.spark.read.parquet(
            *[self._delta_path(kk) for kk in meta["deltas"]]
        )
        all_post = all_post.unionByName(delta)
        gen = meta["gen"] + 1
        table = f"{meta['name']}_g{gen}"
        self._write_base(all_post, table, gen, meta["n_buckets"])
        folded_now = list(meta["deltas"])
        new_meta = dict(
            meta,
            gen=gen,
            table=table,
            n_docs=meta["n_docs"]
            + sum(d["n_docs"] for d in meta["deltas"].values()),
            tok_sum=meta["tok_sum"]
            + sum(d["tok_sum"] for d in meta["deltas"].values()),
            deltas={},
            folded=meta["folded"] + folded_now,
        )
        self._write_meta(new_meta)
        self._drop_generation(meta)
        for key in folded_now:
            shutil.rmtree(self._delta_path(key), ignore_errors=True)
        return self.stats()

    def maintain(self, max_deltas: int = 16) -> dict:
        """Compact when the live delta count exceeds ``max_deltas`` —
        the VectorIndex.maintain policy applied to postings."""
        meta = self._read_meta()
        if len(meta["deltas"]) > max_deltas:
            return self.compact()
        return self.stats()

    # ----------------------------------------------------------- info
    def stats(self) -> dict:
        meta = self._read_meta()
        n_docs = meta["n_docs"] + sum(
            d["n_docs"] for d in meta["deltas"].values()
        )
        tok_sum = meta["tok_sum"] + sum(
            d["tok_sum"] for d in meta["deltas"].values()
        )
        return {
            "gen": meta["gen"],
            "n_docs": n_docs,
            "avgdl": (float(tok_sum) / float(n_docs)) if n_docs else 0.0,
            "n_deltas": len(meta["deltas"]),
            "n_folded": len(meta["folded"]),
        }
