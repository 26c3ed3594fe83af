"""Document chunking for training pipelines: split long documents into
token-bounded, optionally-overlapping chunks.

The step between tokenization and sequence packing in every LLM data
pipeline: documents longer than the context budget are cut into
windows of ``max_tokens`` whitespace tokens with ``overlap`` tokens of
continuity between consecutive windows (overlap preserves context at
the cut, the standard sliding-window recipe).

Chunk arithmetic (1-based token positions, step = max_tokens −
overlap):

    n_chunks = max(ceil((n_tokens − overlap) / step), 1)
    chunk i  = tokens[1 + i·step : +max_tokens]   (i = 0..n_chunks−1)

— every token is covered, consecutive chunks share exactly
``overlap`` tokens (except a shorter final chunk), and a document
within budget yields itself as one chunk.

`pack_sequences` is the companion step: assign the chunks to
fixed-token-budget training sequences (greedy sequential NEXT-fit
within deterministic shards — the order-preserving packing recipe:
a sequence, once closed, is never revisited),
reporting per-sequence fill so the pipeline can grade packing
efficiency.

Scale shape: chunking is pure JVM column expressions — split once,
slice/join per chunk, ONE posexplode for the fan-out; zero shuffles,
whole-stage codegen around the generator, output rows ≈ input
tokens / step. Packing adds exactly ONE shuffle (the shard key) into
an applyInPandas kernel whose per-shard work is a linear scan — the
sequential dependency of the packing scan is confined to a shard,
which is how production packers parallelize it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gus_spark.functions.tokenize import tokenize


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """(id, chunk_index, chunk_text, n_chunk_tokens): the sliding
    token windows of every document with at least one token — null and
    empty/whitespace-only documents yield ZERO chunks, and empty-string
    split artifacts are filtered from the token array (Spark trim()
    strips only ASCII spaces, so '\\n'-padded text otherwise yields
    phantom '' tokens that would inflate n_chunk_tokens and enter
    training sequences)."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must be in [0, max_tokens), got {overlap}"
        )
    step = max_tokens - overlap
    tokens = tokenize(F.col(text_col), "words")
    toks = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), tokens.alias("_ws"))
        .filter(F.size("_ws") > 0)
    )
    size = F.size("_ws")
    n_chunks = F.greatest(
        F.ceil((size - F.lit(overlap)) / F.lit(step)), F.lit(1)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(F.col("_ws"), i * step + 1, max_tokens),
    )
    return (
        toks.select(
            F.col(id_col),
            F.posexplode(chunks).alias("chunk_index", "_chunk"),
        )
        .select(
            F.col(id_col),
            "chunk_index",
            F.array_join("_chunk", " ").alias("chunk_text"),
            F.size("_chunk").cast("long").alias("n_chunk_tokens"),
        )
    )


def reconstruct_documents(
    chunks: DataFrame,
    overlap: int,
    id_col: str = "doc_id",
    index_col: str = "chunk_index",
    text_col: str = "chunk_text",
) -> DataFrame:
    """Inverse of `chunk_documents` (r13): (id, text) — the original
    WHITESPACE-NORMALIZED document text reassembled from its chunk
    windows, exact because the windows slide by (max_tokens −
    overlap): every chunk after index 0 re-carries exactly ``overlap``
    leading tokens of its predecessor, so dropping that prefix tiles
    the token array (the final window is a plain tail slice, never
    clamped backward, and always longer than ``overlap`` — see
    chunk_documents' n_chunks arithmetic). Round-trip asserted in
    tests for every (max_tokens, overlap) shape used in the repo.

    The late-decontamination reader: a PACKED tier carries only
    chunks, but a benchmark that lands after publishing needs
    doc-level n-gram findings — reconstruct, then
    `ngram_contamination`. One exchange on the doc id; per-doc lists
    are document-bounded."""
    if overlap < 0:
        raise ValueError(f"overlap must be >= 0, got {overlap}")
    toks = F.split(F.col(text_col), " ")
    tail = F.when(
        F.col(index_col) == 0, toks
    ).otherwise(
        F.slice(
            toks,
            F.lit(overlap + 1),
            F.greatest(F.size(toks) - overlap, F.lit(0)),
        )
    )
    return (
        chunks.select(
            F.col(id_col),
            F.struct(
                F.col(index_col).alias("i"),
                F.array_join(tail, " ").alias("t"),
            ).alias("_part"),
        )
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list("_part")).alias("_parts"))
        .select(
            F.col(id_col),
            F.array_join(
                F.transform(F.col("_parts"), lambda s: s["t"]), " "
            ).alias("text"),
        )
    )


def pack_sequences(
    chunks: DataFrame,
    id_col: str = "doc_id",
    index_col: str = "chunk_index",
    tokens_col: str = "n_chunk_tokens",
    budget: int = 2048,
    shards: int = 256,
) -> DataFrame:
    """Assign chunks to fixed-budget training sequences: greedy
    sequential NEXT-fit in (id, chunk_index) order within each of
    ``shards`` deterministic hash shards (a closed sequence is never
    reopened — first-fit would revisit all open bins and break the
    order-preserving contract). Returns the input columns
    plus (shard, seq_id, seq_tokens) where seq_id numbers sequences
    within a shard and seq_tokens is the packed sequence's total fill.

    Guarantees (tested): no sequence exceeds ``budget``; a document's
    chunks are assigned in chunk_index order (a sequence never holds
    chunk k+1 before k of the same doc); assignment is deterministic
    across runs and partitionings (shard = pmod(xxhash64(id), shards),
    scan order sorted). Chunks wider than the budget raise upstream —
    callers chunk with max_tokens <= budget by construction.

    The scan is inherently sequential, so the parallel unit is the
    shard: one shuffle on the shard key, then a linear pandas scan per
    shard. Packing quality is within-shard (a chunk never fills
    another shard's open sequence); next-fit's waste bound is
    per-sequence, not per-shard — every CLOSED sequence is filled past
    budget − max(chunk size) (it closed because the next chunk
    overflowed), so waste ≤ max_chunk − 1 tokens per sequence plus one
    arbitrarily-light trailing sequence per shard.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if not 1 <= shards <= 1 << 23:
        # assemble_token_sequences composes seq_uid = shard << 40 |
        # seq_id; a shard at or past 2^23 would overflow into the
        # sign bit and collide loader ids (ADVICE r11 #2)
        raise ValueError(
            f"shards must be in [1, 2^23] (seq_uid packs shard into "
            f"23 high bits), got {shards}"
        )
    sharded = chunks.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards))
    )

    def _pack(pdf):
        pdf = pdf.sort_values([id_col, index_col]).reset_index(drop=True)
        seq_ids, seq_tokens = [], []
        cur_id, cur_fill = 0, 0
        fills: dict[int, int] = {}
        for t in pdf[tokens_col]:
            t = int(t)
            if t > budget:
                raise ValueError(
                    f"chunk of {t} tokens exceeds budget {budget}"
                )
            if cur_fill + t > budget:
                fills[cur_id] = cur_fill
                cur_id += 1
                cur_fill = 0
            seq_ids.append(cur_id)
            cur_fill += t
        fills[cur_id] = cur_fill
        seq_tokens = [fills[s] for s in seq_ids]
        return pdf.assign(seq_id=seq_ids, seq_tokens=seq_tokens)

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in sharded.schema.fields
    ) + ", seq_id long, seq_tokens long"
    return sharded.groupBy("shard").applyInPandas(_pack, schema)


def assemble_token_sequences(
    packed: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    id_col: str = "doc_id",
    index_col: str = "chunk_index",
    text_col: str = "chunk_text",
    include_text: bool = False,
    merge_same_doc: bool = False,
) -> DataFrame:
    """Packed chunks → trainer-ready sequences with attention-mask
    metadata: one row per (shard, seq_id) holding

    - ``seq_uid``   — shard in the high 23 bits, seq_id below
      (collision-free to 2^40 sequences/shard; a decimal multiplier
      would wrap at 10M and silently merge two training examples);
    - ``token_ids`` — the sequence's BPE token-id tensor: each chunk
      encoded by `bpe_encode_ids` (the shared rank-greedy kernel) and
      concatenated in (id, chunk_index) order. Bit-identical to
      encoding the space-joined sequence text, because chunks join on
      a single space and BPE tokenizes per whitespace word — no word
      ever straddles a chunk seam (asserted in tests);
    - ``doc_spans`` — array<struct<id, chunk_index, start, len>> of
      1-based token-id offsets tiling the sequence exactly: the
      boundaries a trainer masks so attention never crosses documents
      (packed sequences hold unrelated docs), nor overlapping windows
      of the same doc (with overlap > 0 adjacent chunks repeat
      tokens — attending across them would let a position see its own
      copy). ``merge_same_doc=True`` folds CONSECUTIVE spans of one
      document into a single per-document span (chunk_index = the
      run's first) — the right mask for overlap=0 packing, where
      intra-document attention is desirable and windows are disjoint;
      it is WRONG for overlap > 0 (a position would attend to its own
      repeated tokens), which is why per-chunk spans stay the
      default;
    - ``n_tokens`` / ``n_unk`` — totals (unks loud, never silent);
    - ``text`` — the assembled sequence text, only when
      ``include_text=True`` (receipts/debugging; production shards
      carry ids).

    Scale shape: the chunk encode rides the packer's output scan (one
    Arrow pass, no shuffle), then ONE exchange on (shard, seq_id) for
    the assembly agg; spans are a JVM `aggregate` fold over the
    collected chunk structs — per-sequence arrays, bounded by the pack
    budget, never corpus-scaled."""
    from gus_spark.operators.bpe import bpe_encode_ids

    id_type = dict(packed.dtypes)[id_col]
    idx_type = dict(packed.dtypes)[index_col]
    carry = ("shard", "seq_id", index_col) + (
        (text_col,) if include_text else ()
    )
    enc = bpe_encode_ids(
        packed,
        merges,
        vocab,
        id_col=id_col,
        text_col=text_col,
        carry_cols=carry,
    )
    # struct field order IS the sort order: (id, chunk_index) leads,
    # and the pair is unique per sequence, so the tail fields never
    # participate in comparisons
    chunk_struct = [
        F.col(id_col),
        F.col(index_col),
        F.col("token_ids"),
        F.col("n_unk"),
    ]
    if include_text:
        chunk_struct.append(F.col(text_col))
    agg = enc.groupBy("shard", "seq_id").agg(
        F.array_sort(F.collect_list(F.struct(*chunk_struct))).alias(
            "_cs"
        )
    )
    span_type = (
        f"array<struct<{id_col}:{id_type},{index_col}:{idx_type},"
        "start:bigint,len:bigint>>"
    )
    spans = F.aggregate(
        F.col("_cs"),
        F.struct(
            F.lit(0).cast("long").alias("off"),
            F.array().cast(span_type).alias("sp"),
        ),
        lambda acc, c: F.struct(
            (acc["off"] + F.size(c["token_ids"])).alias("off"),
            F.concat(
                acc["sp"],
                F.array(
                    F.struct(
                        c[id_col].alias(id_col),
                        c[index_col].alias(index_col),
                        (acc["off"] + 1).alias("start"),
                        F.size(c["token_ids"]).cast("long").alias("len"),
                    )
                ),
            ).alias("sp"),
        ),
        lambda acc: acc["sp"],
    )
    if merge_same_doc:
        # second expression fold over the (already in-order) per-chunk
        # spans: a span whose doc matches the running last span extends
        # it (start kept, len summed, chunk_index = the run's first);
        # same-doc chunks are consecutive by the (id, chunk_index) sort
        spans = F.aggregate(
            spans,
            F.array().cast(span_type),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1)[id_col] == s[id_col]),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(
                        F.struct(
                            F.element_at(acc, -1)[id_col].alias(id_col),
                            F.element_at(acc, -1)[index_col].alias(
                                index_col
                            ),
                            F.element_at(acc, -1)["start"].alias(
                                "start"
                            ),
                            (
                                F.element_at(acc, -1)["len"] + s["len"]
                            ).alias("len"),
                        )
                    ),
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )
    # seq_uid bit-packing is only collision-free inside its field
    # widths; `packed` is caller-shaped (not necessarily from
    # pack_sequences, which validates shards itself), so the bounds
    # are asserted expression-level — a row outside them raises at
    # action time instead of silently aliasing two training examples
    # (ADVICE r11 #2)
    uid_ok = (
        (F.col("shard") >= 0)
        & (F.col("shard") < F.lit(1 << 23))
        & (F.col("seq_id") >= 0)
        & (F.col("seq_id") < F.lit(1 << 40))
    )
    cols = [
        F.when(
            uid_ok,
            F.shiftleft(F.col("shard").cast("long"), 40)
            + F.col("seq_id"),
        )
        .otherwise(
            F.raise_error(
                F.format_string(
                    "seq_uid overflow: (shard=%s, seq_id=%s) outside "
                    "[0, 2^23) x [0, 2^40)",
                    F.col("shard").cast("string"),
                    F.col("seq_id").cast("string"),
                )
            ).cast("long")
        )
        .alias("seq_uid"),
        F.flatten(
            F.transform(F.col("_cs"), lambda c: c["token_ids"])
        ).alias("token_ids"),
        spans.alias("doc_spans"),
        F.aggregate(
            F.col("_cs"),
            F.lit(0).cast("long"),
            lambda a, c: a + c["n_unk"],
        ).alias("n_unk"),
    ]
    if include_text:
        cols.append(
            F.array_join(
                F.transform(F.col("_cs"), lambda c: c[text_col]), " "
            ).alias("text")
        )
    return agg.select(*cols).select(
        "seq_uid",
        "token_ids",
        "doc_spans",
        F.size("token_ids").cast("long").alias("n_tokens"),
        "n_unk",
        *(["text"] if include_text else []),
    )
