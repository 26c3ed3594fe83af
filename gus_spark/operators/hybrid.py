"""Hybrid sparse+dense retrieval: Reciprocal Rank Fusion (RRF) over
the BM25 tier (operators/retrieval.py) and the embedding tier
(operators/similarity.py / vector_index.py).

RRF (Cormack, Clarke & Buettcher, SIGIR 2009): each ranking
contributes 1/(rrf_k + rank) for the documents it returns; documents
sum their contributions and the fused top-k wins. Rank-based fusion
needs NO score calibration between the tiers — BM25's fixed-point log
scores and cosine similarities never meet on one scale, only their
ranks do — which is exactly why RRF is the production default for
sparse+dense ensembles.

Scale shape: fusion itself is O(n_lists x k_each) rows PER QUERY —
top-k shortlists, never corpora — unioned and re-aggregated on
(query_id, id). The real cost is the underlying retrievals, each
already on its scale path: the sparse side rides bucket-pruned
postings (static index) or the base+delta live snapshot, the dense
side probes nprobe/cells of PQ codes. The fused aggregation sums
DOUBLES deterministically by folding contributions in sorted source
order (collect_list -> sort_array -> F.aggregate), so results are
bit-stable under shuffle-order nondeterminism for ANY number of
fused rankings, and bit-identical to the DuckDB twin
(`sql_hybrid_rrf_topk`), which adds COALESCEd per-source terms in the
same order.

Cross-path contract (the repo-wide serving rule): the scan path
(`hybrid_rrf_topk`), the live-index path (`hybrid_rrf_topk_live` over
PostingIndex + VectorIndex with full probe + corpus-wide shortlist),
and the batch path (`hybrid_rrf_batch`) produce identical fused
rankings on the same corpus — asserted in tests/test_hybrid.py —
and curation deletes propagate: ids tombstoned in BOTH indexes
disappear from the live fusion exactly as if re-ranked over the
surviving corpus.

Reference surface: none — the reference engine (a Rust CRUD
webserver) has no retrieval tier; this extends the SURVEY §2.3
training-data/serving layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gus_spark.operators.retrieval import (
    B,
    K1,
    bm25_batch,
    bm25_topk,
    sql_bm25_topk,
)
from gus_spark.operators.similarity import (
    _as_double,
    _dot_cols,
    cosine_sql,
    double_array_sql,
)

#: the standard RRF damping constant (SIGIR'09 uses 60 throughout)
RRF_K = 60


def _contrib(rrf_k: int, weight: float) -> Column:
    # weight * (1.0/(60.0 + rank)): same literal types and op order as
    # the DuckDB twin, so the doubles are bit-identical across engines.
    # Built as parsed SQL text (r13, guide §1.2 driver-side build
    # cost): repr(float)+"D" is the double_array_sql round-trip
    # convention — the parsed literal is the exact IEEE double F.lit
    # would ship, so the expression tree is identical.
    c = f"(1.0D / ({float(rrf_k)!r}D + CAST(rank AS DOUBLE)))"
    if weight != 1.0:
        c = f"({float(weight)!r}D * {c})"
    return F.expr(c)


def rrf_fuse(
    ranked: dict[str, DataFrame],
    k: int,
    rrf_k: int = RRF_K,
    id_col: str = "doc_id",
    query_col: str | None = None,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Fuse named rankings — each a DataFrame with (``id_col``,
    ``rank``) columns, plus ``query_col`` when fusing a whole query
    batch — into the RRF top-k: (id, n_lists, rrf_score) ordered by
    (rrf_score desc, id), per query when batched. ``weights`` scales
    a source's contributions (default 1.0 each — classic unweighted
    RRF): tools/hybrid_grade.py measures the textbook dilution an
    unweighted fusion pays when one tier dominates, and the weight is
    the standard mitigation.

    Contributions fold in SORTED source-name order so the double sum
    is deterministic for any number of rankings (a bare F.sum over a
    shuffle would be order-nondeterministic in the last bits)."""
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranking")
    weights = weights or {}
    if bad := set(weights) - set(ranked):
        raise ValueError(f"weights for unknown sources: {sorted(bad)}")
    keys = ([query_col] if query_col else []) + [id_col]
    parts = [
        df.select(
            *keys,
            F.lit(tag).alias("src"),
            _contrib(rrf_k, weights.get(tag, 1.0)).alias("contrib"),
        )
        for tag, df in sorted(ranked.items())
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    # same sort_array/collect_list/aggregate trees as the Column-API
    # build, parsed in two expressions (r13: the python-lambda
    # F.aggregate build alone cost dozens of py4j round trips)
    fused = (
        u.groupBy(*keys)
        .agg(
            F.expr("sort_array(collect_list(struct(src, contrib)))")
            .alias("cs")
        )
        .select(
            *[F.col(c) for c in keys],
            F.expr("CAST(size(cs) AS LONG)").alias("n_lists"),
            F.expr(
                "aggregate(cs, 0.0D, (acc, x) -> acc + x.contrib)"
            ).alias("rrf_score"),
        )
    )
    if query_col:
        rank = F.row_number().over(
            Window.partitionBy(query_col).orderBy(
                F.col("rrf_score").desc(), F.col(id_col)
            )
        )
        return fused.withColumn("rank", rank).filter(
            F.col("rank") <= k
        ).drop("rank")
    return fused.orderBy(F.col("rrf_score").desc(), F.col(id_col)).limit(k)


def _with_rank(df: DataFrame, order: list[Column]) -> DataFrame:
    """row_number over a k_each-row top-k table — the single-partition
    window is bounded by k_each, never corpus-sized."""
    return df.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(*order)).cast("long"),
    )


def dense_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k for ONE query vector: the query
    broadcasts as a literal array, one fold per row, no shuffle until
    the final top-k. Output (id_col, cos_sim, rank). The fold-order
    dot is the DuckDB list_dot_product contract, so cos values are
    bit-identical to the SQL twin."""
    # r13 (guide §1.2): the per-element F.lit loop + three HOF fold
    # builds cost ~640 py4j round trips per build of this frame;
    # the same trees parse in TWO selectExpr calls. cosine_sql /
    # double_array_sql are the SQL-text twins of cosine_cols / the
    # lit-array build, bit-parity-pinned in tests.
    qv_sql = double_array_sql(query_vec)
    v = vectors.selectExpr(
        f"`{id_col}`",
        f"transform(`{vec_col}`, x -> cast(x as double)) AS nv",
    )
    top = (
        v.selectExpr(
            f"`{id_col}`",
            f"{cosine_sql('nv', qv_sql)} AS cos_sim",
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )
    return _with_rank(top, [F.col("cos_sim").desc(), F.col(id_col)])


def hybrid_rrf_topk(
    docs: DataFrame,
    vectors: DataFrame,
    query: list[str],
    query_vec: list[float],
    k: int,
    k_each: int = 20,
    rrf_k: int = RRF_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    k1: float = K1,
    b: float = B,
    w_sparse: float = 1.0,
    w_dense: float = 1.0,
    phrase: list[str] | None = None,
    w_phrase: float = 1.0,
) -> DataFrame:
    """Scan-path hybrid retrieval: BM25 top-k_each over ``docs`` +
    exact-cosine top-k_each over ``vectors`` (ids must share the
    document id space), RRF-fused to the final top-k. Output
    (id_col, n_lists, rrf_score). ``w_sparse``/``w_dense`` scale each
    tier's contributions (see rrf_fuse). ``phrase`` adds exact-phrase
    occurrence counts (operators/retrieval.phrase_topk) as a THIRD
    fusion source — the forensics stack (which docs verbatim-quote
    the eval question AND look like it AND mean it) in one ranking."""
    sparse = _with_rank(
        bm25_topk(docs, query, k_each, id_col, text_col, k1, b),
        [F.col("score_fp").desc(), F.col(id_col)],
    )
    dense = dense_topk(
        vectors, query_vec, k_each, vec_id_col, vec_col
    ).withColumnRenamed(vec_id_col, id_col)
    ranked = {"dense": dense, "sparse": sparse}
    weights = {"dense": w_dense, "sparse": w_sparse}
    if phrase is not None:
        from gus_spark.operators.retrieval import phrase_topk

        ranked["phrase"] = _with_rank(
            phrase_topk(docs, phrase, k_each, id_col, text_col),
            [F.col("n_occurrences").desc(), F.col(id_col)],
        )
        weights["phrase"] = w_phrase
    return rrf_fuse(ranked, k, rrf_k, id_col, weights=weights)


def hybrid_rrf_topk_live(
    pidx,
    vidx,
    query: list[str],
    query_vec: list[float],
    k: int,
    k_each: int = 20,
    rrf_k: int = RRF_K,
    nprobe: int = 4,
    shortlist: int | None = None,
    rerank_df: DataFrame | None = None,
    k1: float = K1,
    b: float = B,
    w_sparse: float = 1.0,
    w_dense: float = 1.0,
    phrase: list[str] | None = None,
    w_phrase: float = 1.0,
) -> DataFrame:
    """Hybrid retrieval served from the LIVE indexes: PostingIndex
    (sparse snapshot incl. tombstones) + VectorIndex (dense snapshot
    incl. tombstones). With ``rerank_df`` (the raw vector table),
    full probe (nprobe >= cells) and a corpus-covering ``shortlist``,
    the dense ranks are exact and the fused ranking is identical to
    `hybrid_rrf_topk` over the equivalent corpus (asserted in tests);
    production dials nprobe/shortlist down and accepts approximate
    dense ranks for a bounded code scan. Deleted ids (either index)
    drop out of their tier's ranking exactly as a rebuild would.

    The ANN kernel excludes neighbor_id == query_id (self-match —
    right for corpus-member queries); a hybrid query is EXTERNAL
    (free text + its embedding), so it routes under
    ``quantization.RESERVED_QUERY_ID`` — a reserved value in the
    document-id space, ENFORCED at the single choke point every
    indexed vector passes through (`ivf_pq_encode` rejects a batch
    carrying it), so no document can silently drop out of the dense
    tier by colliding with it. The scan path's dense tier has no
    exclusion, and the two must rank the same corpus."""
    from gus_spark.operators.quantization import RESERVED_QUERY_ID

    _SENTINEL_QID = RESERVED_QUERY_ID
    pid = pidx.id_col
    sparse = _with_rank(
        pidx.topk(query, k_each, k1, b),
        [F.col("score_fp").desc(), F.col(pid)],
    ).withColumnRenamed(pid, "doc_id")
    dense = vidx.search(
        [(_SENTINEL_QID, [float(x) for x in query_vec])],
        k=k_each,
        nprobe=nprobe,
        shortlist=shortlist,
        rerank_df=rerank_df,
    ).withColumnRenamed("neighbor_id", "doc_id")
    ranked = {"dense": dense, "sparse": sparse}
    weights = {"dense": w_dense, "sparse": w_sparse}
    if phrase is not None:
        # requires PostingIndex(positional=True) — phrase_topk raises
        # otherwise, exactly as it should (no silent n-gram fallback)
        ranked["phrase"] = _with_rank(
            pidx.phrase_topk(phrase, k_each),
            [F.col("n_occurrences").desc(), F.col(pid)],
        ).withColumnRenamed(pid, "doc_id")
        weights["phrase"] = w_phrase
    return rrf_fuse(ranked, k, rrf_k, "doc_id", weights=weights)


def hybrid_rrf_batch(
    docs: DataFrame,
    vectors: DataFrame,
    query_terms: DataFrame,
    query_vecs: list[tuple[int, list[float]]],
    k: int,
    k_each: int = 20,
    rrf_k: int = RRF_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    k1: float = K1,
    b: float = B,
    w_sparse: float = 1.0,
    w_dense: float = 1.0,
    phrases: DataFrame | None = None,
    w_phrase: float = 1.0,
) -> DataFrame:
    """Whole-eval-suite hybrid: ``query_terms`` is the weighted
    (query_id, w, weight) table `bm25_batch` serves in ONE postings
    pass; ``query_vecs`` the [(query_id, vec)] list the grouped BLAS
    kernel scores in one code scan; ``phrases`` optionally a
    (query_id, phrase array<string>) table `phrase_batch` sweeps in
    one positional-postings pass — the whole-eval-suite forensics
    stack. Per-query RRF fusion rides a single (query_id, id)-keyed
    aggregation over n_queries x n_lists x k_each shortlist rows.
    Output (query_id, doc_id, n_lists, rrf_score), top-k per query."""
    sparse = bm25_batch(
        docs, query_terms, k_each, id_col, text_col, k1, b
    ).select("query_id", F.col(id_col), "rank")
    # exact dense ranks for the whole batch: the Q query vectors ride
    # ONE broadcast against a single corpus scan (never a QxN
    # candidate materialization); the only shuffle is the per-query
    # top-k window. Same cosine expression as dense_topk, so each
    # query's ranks match the single-query path bit-for-bit. This is
    # the exact tier — the IVF/PQ indexes serve the approximate tier
    # at scale.
    spark = docs.sparkSession
    qdf = spark.createDataFrame(
        [(int(q), [float(x) for x in v]) for q, v in query_vecs],
        "query_id bigint, qv array<double>",
    ).select(
        "query_id", "qv",
        F.sqrt(_dot_cols(F.col("qv"), F.col("qv"))).alias("qnorm"),
    )
    # norms PRECOMPUTED per side before the crossJoin — the corpus
    # norm folds once per row instead of once per (row, query), and
    # dot/(nnorm*qnorm) is the same doubles in the same op order as
    # cosine_cols, so per-query ranks stay bit-identical to the
    # single-query path (pinned by test_batch_matches_single_query)
    v = vectors.select(
        F.col(vec_id_col).alias(id_col),
        _as_double(F.col(vec_col)).alias("nv"),
    ).withColumn("nnorm", F.sqrt(_dot_cols(F.col("nv"), F.col("nv"))))
    cos = _dot_cols(F.col("nv"), F.col("qv")) / (
        F.col("nnorm") * F.col("qnorm")
    )
    drank = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col(id_col)
        )
    )
    dense = (
        v.crossJoin(F.broadcast(qdf))
        .select("query_id", F.col(id_col), cos.alias("cos_sim"))
        .withColumn("rank", drank)
        .filter(F.col("rank") <= k_each)
        .select("query_id", F.col(id_col), "rank")
    )
    ranked = {"dense": dense, "sparse": sparse}
    weights = {"dense": w_dense, "sparse": w_sparse}
    if phrases is not None:
        from gus_spark.operators.retrieval import phrase_batch

        ranked["phrase"] = phrase_batch(
            docs, phrases, k_each, id_col, text_col
        ).select("query_id", F.col(id_col), "rank")
        weights["phrase"] = w_phrase
    return rrf_fuse(
        ranked,
        k,
        rrf_k,
        id_col,
        query_col="query_id",
        weights=weights,
    )


def sql_hybrid_rrf_topk(
    query: list[str],
    query_vec: list[float] | str,
    k: int,
    k_each: int = 20,
    rrf_k: int = RRF_K,
    table: str = "documents",
    vec_table: str = "embeddings",
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    k1: float = K1,
    b: float = B,
    w_sparse: float = 1.0,
    w_dense: float = 1.0,
    phrase: list[str] | None = None,
    w_phrase: float = 1.0,
) -> str:
    """DuckDB twin of `hybrid_rrf_topk`, expression-for-expression:
    sql_bm25_topk as the sparse CTE, list_dot_product cosine (the
    fold-order contract) as the dense CTE, sql_phrase_topk as the
    optional phrase CTE; COALESCEd contributions added in sorted
    source order (dense, phrase, sparse) = the Spark fold. Used by
    tests/test_hybrid.py and the driver catalog probe.

    ``query_vec`` may be a SQL expression string (e.g. an uncorrelated
    scalar subquery over the embeddings view) instead of a literal
    list — the STATIC-oracle form the driver catalog needs, since its
    oracle strings are fixed at registration while the probe vector
    lives in the data. Either form is CAST to DOUBLE[] before the
    fold, so the doubles match the Spark literal-array path exactly
    (float32 -> double widening is value-preserving)."""
    from gus_spark.operators.retrieval import sql_phrase_topk

    vec_lit = (
        f"({query_vec})"
        if isinstance(query_vec, str)
        else "[" + ", ".join(repr(float(x)) for x in query_vec) + "]"
    )
    sparse_sql = sql_bm25_topk(query, k_each, table, id_col, text_col, k1, b)

    def wexpr(rank_ref: str, w: float) -> str:
        # structural twin of _contrib: the weight multiply is SKIPPED
        # at 1.0 in both engines, applied as w * (1/(k+rank)) otherwise
        c = (f"1.0 / (CAST({float(rrf_k)!r} AS DOUBLE) "
             f"+ CAST({rank_ref} AS DOUBLE))")
        if w == 1.0:
            return c
        return f"CAST({float(w)!r} AS DOUBLE) * ({c})"

    phrase_cte = phrase_join = ""
    phrase_hit = phrase_contrib = ""
    id_of = "COALESCE(d.id, s.id)"
    if phrase is not None:
        phrase_sql = sql_phrase_topk(
            phrase, k_each, table, id_col, text_col
        )
        phrase_cte = f""",
    phrase AS (
      SELECT {id_col} AS id,
             ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, {id_col})
               AS rank
      FROM ({phrase_sql})
    )"""
        phrase_join = (
            "\n      FULL OUTER JOIN phrase p ON COALESCE(d.id, s.id)"
            " = p.id"
        )
        phrase_hit = "\n                + (CASE WHEN p.id IS NULL THEN 0 ELSE 1 END)"
        # sorted source order: dense < phrase < sparse
        phrase_contrib = (
            f"\n             + COALESCE({wexpr('p.rank', w_phrase)}, 0.0)"
        )
        id_of = "COALESCE(d.id, s.id, p.id)"
    return f"""
    WITH sparse AS (
      SELECT {id_col} AS id,
             ROW_NUMBER() OVER (ORDER BY score_fp DESC, {id_col})
               AS rank
      FROM ({sparse_sql})
    ),
    dense AS (
      SELECT id, ROW_NUMBER() OVER (ORDER BY cos_sim DESC, id) AS rank
      FROM (
        SELECT {vec_id_col} AS id,
               list_dot_product(CAST({vec_col} AS DOUBLE[]),
                                CAST({vec_lit} AS DOUBLE[]))
                 / (SQRT(list_dot_product(CAST({vec_col} AS DOUBLE[]),
                                          CAST({vec_col} AS DOUBLE[])))
                    * SQRT(list_dot_product(CAST({vec_lit} AS DOUBLE[]),
                                            CAST({vec_lit} AS DOUBLE[]))))
                 AS cos_sim
        FROM {vec_table}
        ORDER BY cos_sim DESC, id
        LIMIT {k_each}
      )
    ){phrase_cte}
    SELECT {id_of} AS {id_col},
           CAST((CASE WHEN d.id IS NULL THEN 0 ELSE 1 END)
                + (CASE WHEN s.id IS NULL THEN 0 ELSE 1 END){phrase_hit}
                AS BIGINT) AS n_lists,
           COALESCE({wexpr("d.rank", w_dense)}, 0.0){phrase_contrib}
             + COALESCE({wexpr("s.rank", w_sparse)}, 0.0)
             AS rrf_score
    FROM dense d FULL OUTER JOIN sparse s ON d.id = s.id{phrase_join}
    ORDER BY rrf_score DESC, {id_col}
    LIMIT {k}
    """
