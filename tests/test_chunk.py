"""Document-chunking operator: hand-checked windows, a Python
reference sweep, a DuckDB SQL mirror (oracle-grade parity without a
catalog slot), and parameter validation."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gus_spark.operators.chunk import chunk_documents


def _py_chunks(text, max_tokens, overlap):
    """Reference implementation of the documented arithmetic."""
    import re

    ws = re.split(r"\s+", text.strip(), flags=re.ASCII)
    step = max_tokens - overlap
    n = max(math.ceil((len(ws) - overlap) / step), 1)
    return [
        (" ".join(ws[i * step : i * step + max_tokens]),
         len(ws[i * step : i * step + max_tokens]))
        for i in range(n)
    ]


def _collect(spark, rows, max_tokens, overlap):
    frame = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for r in chunk_documents(
        frame, max_tokens=max_tokens, overlap=overlap
    ).collect():
        out.setdefault(r["doc_id"], {})[r["chunk_index"]] = (
            r["chunk_text"], r["n_chunk_tokens"]
        )
    return {
        d: [m[i] for i in sorted(m)] for d, m in out.items()
    }


def test_chunk_hand_cases(spark):
    rows = [
        (0, "a b c d e f g h i j"),   # 10 tokens
        (1, "short doc"),             # within budget -> itself
        (2, ""),                      # split('') -> [''] -> one chunk
        (3, None),                    # dropped
    ]
    got = _collect(spark, rows, max_tokens=4, overlap=1)
    # step 3 -> ceil(9/3)=3 chunks: [1..4], [4..7], [7..10]
    assert got[0] == [("a b c d", 4), ("d e f g", 4), ("g h i j", 4)]
    assert got[1] == [("short doc", 2)]
    # empty/whitespace-only docs yield ZERO chunks (no phantom
    # 1-token '' chunk entering training sequences), nulls drop
    assert 2 not in got
    assert 3 not in got
    # consecutive chunks share exactly `overlap` tokens
    assert got[0][0][0].split()[-1:] == got[0][1][0].split()[:1]


def test_chunk_matches_python_reference(spark):
    import random

    rng = random.Random(23)
    rows = [
        (i, " ".join(f"t{rng.randrange(50)}" for _ in range(n)))
        for i, n in enumerate(
            [1, 2, 5, 7, 8, 9, 16, 17, 63, 64, 65, 200, 513]
        )
    ]
    for max_tokens, overlap in [(8, 0), (8, 3), (64, 16), (512, 64)]:
        got = _collect(spark, rows, max_tokens, overlap)
        for i, text in rows:
            assert got[i] == _py_chunks(text, max_tokens, overlap), (
                i, max_tokens, overlap
            )
        # coverage: concatenating chunks minus overlaps rebuilds the doc
        for i, text in rows:
            step = max_tokens - overlap
            toks = []
            for j, (ct, _) in enumerate(got[i]):
                parts = ct.split(" ") if ct else [""]
                toks.extend(parts if j == 0 else parts[overlap:])
            import re

            assert toks == re.split(r"\s+", text.strip(), flags=re.ASCII)


def test_chunk_duckdb_mirror(spark):
    """Oracle-grade parity on the real documents table: the same
    arithmetic expressed in DuckDB SQL yields the identical
    (doc_id, chunk_index, chunk_text, n_chunk_tokens) set."""
    from conftest import SF_DIR_ORACLE

    from gus_spark.queries import table

    max_tokens, overlap, step = 16, 4, 12
    docs = table(spark, SF_DIR_ORACLE, "documents")
    got = {
        (r["doc_id"], r["chunk_index"], r["chunk_text"],
         r["n_chunk_tokens"])
        for r in chunk_documents(
            docs, max_tokens=max_tokens, overlap=overlap
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_DIR_ORACLE}/documents.parquet'"
    )
    oracle = con.execute(rf"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS ws
          FROM documents WHERE text IS NOT NULL AND TRIM(text) <> ''
        ), spans AS (
          SELECT doc_id, ws,
                 GREATEST(CAST(CEIL((len(ws) - {overlap}) / {step}.0)
                               AS BIGINT), 1) AS n_chunks
          FROM toks
        )
        SELECT doc_id, CAST(i AS INT) AS chunk_index,
               array_to_string(ws[i * {step} + 1 :
                               i * {step} + {max_tokens}], ' ')
                 AS chunk_text,
               CAST(len(ws[i * {step} + 1 : i * {step} + {max_tokens}])
                 AS BIGINT) AS n_chunk_tokens
        FROM spans, UNNEST(range(0, n_chunks)) AS u(i)
    """).fetchall()
    assert got == set(map(tuple, oracle))


def test_chunk_zero_shuffle_plan(spark):
    """Chunking is a pure scan+generate map: no Exchange of any kind,
    no Python stage."""
    import contextlib
    import io

    from conftest import SF_DIR

    from gus_spark.queries import table

    df = chunk_documents(table(spark, SF_DIR, "documents"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan
    assert "Python" not in plan and "InPandas" not in plan, plan
    assert "Generate" in plan, plan  # the posexplode fan-out


def test_chunk_param_validation(spark):
    frame = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_tokens"):
        chunk_documents(frame, max_tokens=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(frame, max_tokens=8, overlap=8)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(frame, max_tokens=8, overlap=-1)


def test_pack_sequences_contract(spark):
    """Packing invariants on real chunked documents: no sequence over
    budget, per-sequence fill totals consistent, document chunk order
    preserved within the packing scan, deterministic across runs and
    input partitionings, and fill efficiency is sane (every non-final
    sequence of a shard holds more than budget - max_tokens tokens —
    else first-fit would have kept filling it)."""
    from conftest import SF_DIR_ORACLE

    from gus_spark.operators.chunk import pack_sequences
    from gus_spark.queries import table

    max_tokens, budget = 16, 48
    chunks = chunk_documents(
        table(spark, SF_DIR_ORACLE, "documents"),
        max_tokens=max_tokens,
        overlap=4,
    )
    packed = pack_sequences(chunks, budget=budget, shards=8)
    rows = packed.collect()
    assert len(rows) == chunks.count()

    by_seq = {}
    for r in rows:
        by_seq.setdefault((r["shard"], r["seq_id"]), []).append(r)
    for (shard, seq_id), members in by_seq.items():
        total = sum(r["n_chunk_tokens"] for r in members)
        assert total <= budget, (shard, seq_id, total)
        assert all(r["seq_tokens"] == total for r in members)
    # non-final sequences are well-filled
    max_seq = {}
    for shard, seq_id in by_seq:
        max_seq[shard] = max(max_seq.get(shard, -1), seq_id)
    for (shard, seq_id), members in by_seq.items():
        if seq_id < max_seq[shard]:
            assert members[0]["seq_tokens"] > budget - max_tokens
    # a doc's chunks appear in order along (seq_id, then scan order)
    per_doc = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["seq_id"])):
        per_doc.setdefault(r["doc_id"], []).append(r["chunk_index"])
    for doc, idxs in per_doc.items():
        assert idxs == sorted(idxs), doc

    key = {
        (r["doc_id"], r["chunk_index"]): (r["shard"], r["seq_id"])
        for r in rows
    }
    again = {
        (r["doc_id"], r["chunk_index"]): (r["shard"], r["seq_id"])
        for r in pack_sequences(
            chunks.repartition(13), budget=budget, shards=8
        ).collect()
    }
    assert key == again


def test_pack_sequences_rejects_oversized_and_bad_params(spark):
    from gus_spark.operators.chunk import pack_sequences

    frame = spark.createDataFrame(
        [(0, 0, 100)], "doc_id long, chunk_index int, n_chunk_tokens long"
    )
    with pytest.raises(Exception) as exc:
        pack_sequences(frame, budget=50, shards=2).collect()
    assert "exceeds budget" in str(exc.value)
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(frame, budget=0)
    with pytest.raises(ValueError, match="shards"):
        pack_sequences(frame, shards=0)
    # seq_uid packs shard into 23 high bits (ADVICE r11 #2)
    with pytest.raises(ValueError, match="2\\^23"):
        pack_sequences(frame, shards=(1 << 23) + 1)


def test_seq_uid_overflow_is_loud(spark):
    """assemble_token_sequences consumes caller-shaped frames, so the
    seq_uid field bounds (shard < 2^23, seq_id < 2^40) are asserted
    expression-level: an out-of-range row raises at action time
    instead of silently aliasing two training examples (ADVICE r11
    #2). In-range rows on the same plan still compute."""
    from gus_spark.operators.bpe import (
        bpe_base_symbols,
        bpe_fit,
        bpe_vocab,
    )
    from gus_spark.operators.chunk import assemble_token_sequences

    fit_df = spark.createDataFrame(
        [(0, "alpha beta")], "doc_id long, text string"
    )
    merges = bpe_fit(fit_df, num_merges=2)
    vocab = bpe_vocab(merges, bpe_base_symbols(fit_df))
    packed = spark.createDataFrame(
        [
            (0, 0, "alpha beta", 1, 0),
            (1, 0, "alpha beta", 1 << 23, 0),  # shard out of range
        ],
        "doc_id long, chunk_index int, chunk_text string, "
        "shard long, seq_id long",
    )
    ok = assemble_token_sequences(
        packed.filter("shard = 1"), merges, vocab
    ).collect()
    assert ok[0]["seq_uid"] == (1 << 40)
    with pytest.raises(Exception, match="seq_uid overflow"):
        assemble_token_sequences(packed, merges, vocab).collect()


class TestAssembleTokenSequences:
    """assemble_token_sequences (r11): packed chunks → trainer
    sequences with token-id tensors and doc-boundary spans. Claims:
    spans tile the sequence exactly (1-based, gap-free, len sums to
    n_tokens); per-chunk encode concatenated == whole-text encode
    (chunks join on a single space, BPE is per whitespace word); each
    span's id slice decodes back to its chunk's text; n_unk sums."""

    TEXTS = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "one two three four five six"),
        (2, "alpha beta alpha beta alpha beta"),
        (3, "solo"),
    ]

    @pytest.fixture(scope="class")
    def fitted(self, spark):
        from gus_spark.operators.bpe import (
            bpe_base_symbols,
            bpe_fit,
            bpe_vocab,
        )

        df = spark.createDataFrame(
            self.TEXTS, "doc_id long, text string"
        )
        merges = bpe_fit(df, num_merges=8, merge_batch=1)
        vocab = bpe_vocab(merges, bpe_base_symbols(df))
        return df, merges, vocab

    @pytest.fixture(scope="class")
    def sequences(self, spark, fitted):
        from gus_spark.operators.chunk import (
            assemble_token_sequences,
            pack_sequences,
        )

        df, merges, vocab = fitted
        chunks = chunk_documents(df, max_tokens=4, overlap=1)
        packed = pack_sequences(chunks, budget=8, shards=2)
        return assemble_token_sequences(
            packed, merges, vocab, include_text=True
        ).collect()

    def test_spans_tile_exactly(self, sequences):
        assert sequences
        for r in sequences:
            spans = sorted(r.doc_spans, key=lambda s: s.start)
            assert spans[0].start == 1
            off = 1
            for s in spans:
                assert s.start == off and s.len > 0, r
                off += s.len
            assert off - 1 == r.n_tokens == len(r.token_ids), r

    def test_concat_equals_whole_text_encode(self, spark, fitted, sequences):
        from gus_spark.operators.bpe import bpe_encode_ids

        _df, merges, vocab = fitted
        texts = spark.createDataFrame(
            [(r.seq_uid, r.text) for r in sequences],
            "seq_uid long, text string",
        )
        whole = {
            r.seq_uid: list(r.token_ids)
            for r in bpe_encode_ids(
                texts, merges, vocab, id_col="seq_uid"
            ).collect()
        }
        for r in sequences:
            assert list(r.token_ids) == whole[r.seq_uid], r.seq_uid

    def test_each_span_decodes_to_its_chunk(self, spark, fitted, sequences):
        from gus_spark.operators.bpe import bpe_decode_ids
        from gus_spark.operators.chunk import pack_sequences

        df, _merges, vocab = fitted
        chunks = {
            (r.doc_id, r.chunk_index): r.chunk_text
            for r in chunk_documents(df, max_tokens=4, overlap=1)
            .collect()
        }
        for r in sequences:
            ids = list(r.token_ids)
            for s in r.doc_spans:
                got = bpe_decode_ids(
                    ids[s.start - 1 : s.start - 1 + s.len], vocab
                )
                assert got == chunks[(s.doc_id, s.chunk_index)], s

    def test_overlap_windows_get_separate_spans(self, sequences):
        """With overlap > 0 adjacent chunks of one doc repeat tokens —
        they must stay separate spans (attending across them would
        leak a position its own copy), distinguished by chunk_index."""
        per_doc = {}
        for r in sequences:
            for s in r.doc_spans:
                per_doc.setdefault(s.doc_id, set()).add(s.chunk_index)
        # doc 0 has 8 tokens, max_tokens=4, overlap=1 -> 3 chunks
        assert per_doc[0] == {0, 1, 2}

    def test_n_unk_sums_and_zero_here(self, sequences):
        assert all(r.n_unk == 0 for r in sequences)

    def test_without_text_column(self, spark, fitted):
        from gus_spark.operators.chunk import (
            assemble_token_sequences,
            pack_sequences,
        )

        df, merges, vocab = fitted
        chunks = chunk_documents(df, max_tokens=4, overlap=1)
        packed = pack_sequences(chunks, budget=8, shards=2)
        out = assemble_token_sequences(packed, merges, vocab)
        assert out.columns == [
            "seq_uid", "token_ids", "doc_spans", "n_tokens", "n_unk"
        ]
        assert out.count() > 0


@pytest.mark.parametrize(
    "max_tokens,overlap,budget",
    [(3, 0, 7), (5, 2, 11), (4, 1, 4)],
)
def test_spans_tile_under_parameter_sweep(spark, max_tokens, overlap, budget):
    """Span arithmetic holds across chunk/pack parameter shapes,
    including budget == max_tokens (every chunk its own sequence):
    1-based gap-free tiling, concat == whole-text encode, totals."""
    from gus_spark.operators.bpe import (
        bpe_base_symbols,
        bpe_encode_ids,
        bpe_fit,
        bpe_vocab,
    )
    from gus_spark.operators.chunk import (
        assemble_token_sequences,
        pack_sequences,
    )

    texts = [
        (i, " ".join(f"w{j % 7}x{(i + j) % 5}" for j in range(3 + i * 2)))
        for i in range(6)
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    merges = bpe_fit(df, num_merges=6, merge_batch=2)
    vocab = bpe_vocab(merges, bpe_base_symbols(df))
    chunks = chunk_documents(df, max_tokens=max_tokens, overlap=overlap)
    packed = pack_sequences(chunks, budget=budget, shards=2)
    seqs = assemble_token_sequences(
        packed, merges, vocab, include_text=True
    ).collect()
    assert seqs
    whole = {
        r.seq_uid: list(r.token_ids)
        for r in bpe_encode_ids(
            spark.createDataFrame(
                [(r.seq_uid, r.text) for r in seqs],
                "seq_uid long, text string",
            ),
            merges,
            vocab,
            id_col="seq_uid",
        ).collect()
    }
    for r in seqs:
        spans = sorted(r.doc_spans, key=lambda s: s.start)
        off = 1
        for s in spans:
            assert s.start == off and s.len > 0
            off += s.len
        assert off - 1 == r.n_tokens == len(r.token_ids)
        assert list(r.token_ids) == whole[r.seq_uid]


def test_merge_same_doc_spans(spark):
    """merge_same_doc=True (overlap=0 packing): consecutive spans of a
    document fold into one per-doc span — tiling preserved, lens sum,
    chunk_index is the run's first — while single-chunk docs and the
    default per-chunk form are untouched."""
    from gus_spark.operators.bpe import (
        bpe_base_symbols,
        bpe_fit,
        bpe_vocab,
    )
    from gus_spark.operators.chunk import (
        assemble_token_sequences,
        pack_sequences,
    )

    df = spark.createDataFrame(
        [
            (0, "a1 a2 a3 a4 a5 a6"),   # 3 chunks of 2 at max_tokens=2
            (1, "b1 b2"),               # 1 chunk
        ],
        "doc_id long, text string",
    )
    merges = bpe_fit(df, num_merges=4, merge_batch=1)
    vocab = bpe_vocab(merges, bpe_base_symbols(df))
    chunks = chunk_documents(df, max_tokens=2, overlap=0)
    packed = pack_sequences(chunks, budget=100, shards=1)
    plain = assemble_token_sequences(packed, merges, vocab).collect()
    merged = assemble_token_sequences(
        packed, merges, vocab, merge_same_doc=True
    ).collect()
    assert len(plain) == len(merged) == 1
    p, m = plain[0], merged[0]
    assert list(p.token_ids) == list(m.token_ids)
    # per-chunk: 3 spans for doc 0 + 1 for doc 1; merged: one each
    assert sorted(s.doc_id for s in p.doc_spans) == [0, 0, 0, 1]
    assert sorted(s.doc_id for s in m.doc_spans) == [0, 1]
    by_doc = {s.doc_id: s for s in m.doc_spans}
    assert by_doc[0].chunk_index == 0  # the run's first
    assert by_doc[0].len == sum(
        s.len for s in p.doc_spans if s.doc_id == 0
    )
    # tiling holds after the merge
    off = 1
    for s in sorted(m.doc_spans, key=lambda s: s.start):
        assert s.start == off and s.len > 0
        off += s.len
    assert off - 1 == m.n_tokens


def test_reconstruct_documents_round_trips(spark):
    """reconstruct_documents (r13): chunk → reconstruct returns the
    whitespace-normalized original for every window shape the repo
    uses (incl. overlap 0 and a window wider than most docs), every
    document, bit-for-bit."""
    from conftest import SF_DIR_ORACLE

    from pyspark.sql import functions as F

    from gus_spark.functions.tokenize import tokenize
    from gus_spark.operators.chunk import (
        chunk_documents,
        reconstruct_documents,
    )
    from gus_spark.queries import table

    docs = table(spark, SF_DIR_ORACLE, "documents").select(
        "doc_id", "text"
    )
    want = {
        r.doc_id: r.norm
        for r in docs.select(
            "doc_id",
            F.array_join(tokenize(F.col("text"), "words"), " ").alias(
                "norm"
            ),
        ).collect()
        if r.norm  # empty docs yield zero chunks by contract
    }
    for max_tokens, overlap in ((16, 4), (512, 64), (16, 0), (7, 6)):
        got = {
            r.doc_id: r.text
            for r in reconstruct_documents(
                chunk_documents(
                    docs, max_tokens=max_tokens, overlap=overlap
                ),
                overlap,
            ).collect()
        }
        assert got == want, (max_tokens, overlap)
