"""BPE tokenizer training/encoding vs a pure-Python Sennrich
reference: identical merge lists (deterministic tie-breaks), identical
encodings, character fallback on unseen words, and the fit's
vocab-not-corpus scale contract."""

import os
import re
import sys
from collections import Counter

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gus_spark.operators.bpe import EOW, bpe_encode, bpe_fit, word_counts


# ---------------------------------------------------------------- reference
def _ref_symbols(word):
    chars = list(word)
    chars[-1] = chars[-1] + EOW
    return chars


def _ref_merge_all(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_tokenize(t):
    # ASCII \s+ split + empty filter — the exact JVM trim/split/filter
    # pipeline of word_counts; deliberately NOT str.strip() (Unicode
    # whitespace stays inside boundary words, matching the fit)
    return [w for w in re.split(r"\s+", t, flags=re.ASCII) if w]


def _ref_fit(texts, num_merges):
    vocab = Counter()
    for t in texts:
        for w in _ref_tokenize(t):
            vocab[w] += 1
    words = {w: _ref_symbols(w) for w in vocab}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += vocab[w]
        if not pairs:
            break
        # max count, ties -> lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        words = {w: _ref_merge_all(s, a, b) for w, s in words.items()}
    return merges


def _ref_fit_batched(texts, num_merges, merge_batch):
    """Pure-Python twin of the parallel fit: frozen per-round counts,
    top-(4*batch) candidate window, greedy symbol/output-disjoint
    admission, sequential replay of the admitted batch."""
    vocab = Counter()
    for t in texts:
        for w in _ref_tokenize(t):
            vocab[w] += 1
    words = {w: _ref_symbols(w) for w in vocab}
    merges, rounds = [], []
    while len(merges) < num_merges:
        pairs = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += vocab[w]
        cands = sorted(
            ((p, n) for p, n in pairs.items() if n >= 2),
            key=lambda kv: (-kv[1], kv[0]),
        )[: 4 * merge_batch]
        if not cands:
            break
        admitted, used = [], set()
        for (a, b), _n in cands:
            if len(admitted) >= min(merge_batch, num_merges - len(merges)):
                break
            if a in used or b in used or (a + b) in used:
                continue
            admitted.append((a, b))
            used.update((a, b, a + b))
        merges.extend(admitted)
        rounds.append(list(admitted))
        for a, b in admitted:
            words = {w: _ref_merge_all(s, a, b) for w, s in words.items()}
    return merges, rounds


def _ref_encode(text, merges):
    ranks = {p: r for r, p in enumerate(merges)}
    toks = []
    for w in _ref_tokenize(text):
        syms = _ref_symbols(w)
        while len(syms) >= 2:
            ranked = [
                (ranks[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in ranks
            ]
            if not ranked:
                break
            _, i = min(ranked)
            syms = _ref_merge_all(syms, syms[i], syms[i + 1])
        toks.extend(syms)
    return toks


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "the lowest newest widest low",
]


def test_bpe_fit_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    got = bpe_fit(df, num_merges=12, merge_batch=1)
    want = _ref_fit(CORPUS, 12)
    assert got == want
    # the classic example: 'newest' family drives early merges toward
    # 'est</w>' pieces
    flat = ["".join(p) for p in got]
    assert any("est" in s for s in flat)


def test_bpe_encode_matches_reference_and_falls_back(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    merges = bpe_fit(df, num_merges=10, merge_batch=1)
    probe = spark.createDataFrame(
        [
            (0, "low lowest newest"),
            (1, "zzz unseen"),          # unseen words -> char fallback
            (2, ""),
            (3, None),                   # dropped
            (4, "  low   newest  "),     # whitespace runs
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: list(r["tokens"]) for r in
           bpe_encode(probe, merges).collect()}
    for i, t in [(0, "low lowest newest"), (1, "zzz unseen"), (2, ""),
                 (4, "  low   newest  ")]:
        assert out[i] == _ref_encode(t, merges), i
    assert 3 not in out
    # unseen word decomposed to (mostly) characters
    assert len(out[1]) >= 6
    # round-trip property: concatenating tokens and splitting on the
    # sentinel reconstructs the exact word sequence
    rebuilt = "".join(out[0]).replace(EOW, " ").split()
    assert rebuilt == ["low", "lowest", "newest"]


def test_bpe_fit_on_vocab_not_corpus(spark):
    """Scale contract: fit statistics depend only on the word-count
    multiset — duplicating every document must not change the merges
    beyond frequency scaling (identical merge list), and word_counts
    is the only corpus-sized aggregation.

    Pinned to merge_batch=1: classic BPE only reads the per-round
    ARGMAX, which duplication cannot move, so the list is invariant.
    A batch digs below the argmax, where the absolute `count >= 2`
    repeat threshold is not scale-invariant (a once-seen pair becomes
    admissible when every document is tripled) — by design, matching
    the Python twin at every scale (asserted in the batched tests)."""
    df1 = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    df2 = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS * 3)],
        "doc_id long, text string",
    )
    assert bpe_fit(df1, num_merges=8, merge_batch=1) == bpe_fit(
        df2, num_merges=8, merge_batch=1
    )
    wc = {r["word"]: r["count"] for r in word_counts(df1).collect()}
    assert wc["low"] == 6 and wc["newest"] == 7


def test_bpe_early_stop_and_validation(spark):
    import pytest

    df = spark.createDataFrame(
        [(0, "a b c")], "doc_id long, text string"
    )
    # no pair ever repeats -> early stop with no merges
    assert bpe_fit(df, num_merges=5) == []
    with pytest.raises(ValueError, match="num_merges"):
        bpe_fit(df, num_merges=0)


def test_bpe_property_random_corpora(spark):
    """Property form of the reference parity: random small corpora
    (repeated short words over a tiny alphabet force real merges) must
    yield the reference's exact merge list AND encodings at every
    checkpoint cadence — pinning cadence-independence of the fit."""
    import random

    rng = random.Random(0xB9E)
    vocab = ["ab", "abc", "abab", "ba", "cab", "aabb", "b", "ccc"]
    for trial in range(12):
        texts = [
            " ".join(
                rng.choice(vocab)
                for _ in range(rng.randrange(1, 13))
            )
            for _ in range(rng.randrange(2, 7))
        ]
        num_merges = rng.randrange(1, 11)
        cadence = rng.choice([1, 3, 8])
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        batch = rng.choice([1, 2, 5])
        got = bpe_fit(
            df,
            num_merges=num_merges,
            checkpoint_every=cadence,
            merge_batch=batch,
        )
        if batch == 1:
            want = _ref_fit(texts, num_merges)
        else:
            want, _ = _ref_fit_batched(texts, num_merges, batch)
        assert got == want, (trial, texts, num_merges, cadence, batch)
        enc = {
            r["doc_id"]: list(r["tokens"])
            for r in bpe_encode(df, got).collect()
        }
        for i, t in enumerate(texts):
            assert enc[i] == _ref_encode(t, got), (trial, i, t)


def test_bpe_checkpoint_every_validation(spark):
    import pytest

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    for bad in (0, 33):
        with pytest.raises(ValueError, match="checkpoint_every"):
            bpe_fit(df, num_merges=1, checkpoint_every=bad)
    for bad in (0, 65):
        with pytest.raises(ValueError, match="merge_batch"):
            bpe_fit(df, num_merges=1, merge_batch=bad)


# ------------------------------------------------- parallel merge batching
def test_bpe_batched_matches_python_twin_and_conflict_rule(spark):
    """The batched fit must equal the pure-Python twin exactly, and
    every admitted round must satisfy the standard parallel-BPE
    conflict rule: pairwise disjoint symbols AND no symbol/output
    token collisions (that disjointness is what makes the frozen
    counts exact under sequential replay)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    for batch in (2, 4, 8):
        stats = {}
        got = bpe_fit(df, num_merges=16, merge_batch=batch, stats=stats)
        want, rounds = _ref_fit_batched(CORPUS, 16, batch)
        assert got == want, batch
        assert stats["batch_sizes"] == [len(r) for r in rounds]
        for rnd in rounds:
            used = set()
            for a, b in rnd:
                assert a not in used and b not in used and (a + b) not in used
                used.update((a, b, a + b))


def test_bpe_batched_encoding_vs_sequential_on_corpus(spark):
    """Batched vs sequential tokenizer on the test corpus, quantified
    (not assumed): 4 of 5 documents encode IDENTICALLY; the one
    divergence is the word 'lowest', which sequential splits
    `lo|west</w>` and batched `low|est</w>` — same piece count, so
    total compression is EQUAL (26 tokens both). This is the
    documented parallel-BPE deviation class (rank reordering within a
    batch changes greedy tie evolution for words outside the dominant
    families); the conflict rule that bounds it is asserted in
    test_bpe_batched_matches_python_twin_and_conflict_rule."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    seq = bpe_fit(df, num_merges=12, merge_batch=1)
    par = bpe_fit(df, num_merges=12, merge_batch=8)
    enc_seq = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_encode(df, seq).collect()
    }
    enc_par = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_encode(df, par).collect()
    }
    same = [i for i in enc_seq if enc_seq[i] == enc_par[i]]
    assert len(same) == 4 and 4 not in same
    # equal compression, and both tokenizers round-trip exactly
    assert sum(len(v) for v in enc_seq.values()) == sum(
        len(v) for v in enc_par.values()
    )
    for i, t in enumerate(CORPUS):
        for enc in (enc_seq, enc_par):
            rebuilt = "".join(enc[i]).replace(EOW, " ").split()
            assert rebuilt == t.split()


def test_bpe_batched_round_reduction(spark):
    """The scale claim: >=3x fewer driver round-trips at 32 merges on
    a real corpus (VERDICT r6 'done' bar). rounds == collect jobs."""
    from conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    seq_stats, par_stats = {}, {}
    seq = bpe_fit(
        docs, num_merges=32, merge_batch=1, stats=seq_stats
    )
    par = bpe_fit(
        docs, num_merges=32, merge_batch=8, stats=par_stats
    )
    assert seq_stats["rounds"] == 32
    assert len(seq) == len(par) == 32
    assert par_stats["rounds"] * 3 <= seq_stats["rounds"], par_stats
    # batched merges stay a valid tokenizer: encodings round-trip
    out = bpe_encode(docs, par).limit(5).collect()
    for r in out:
        assert r["n_tokens"] == len(r["tokens"])


def test_bpe_tokenization_parity_exotic_whitespace(spark):
    """ADVICE r6 low: encode-time tokenization must match the fit's
    JVM trim+split+filter on texts with Unicode whitespace (U+00A0,
    U+2028) and control chars at word boundaries — Python str.strip()
    would remove them; the JVM pipeline keeps them inside words."""
    texts = [
        "foo  foo  bar baz bar baz",
        "\nfoo  edge\x01case edge\x01case\t",
        "plain plain words words",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    # fit-side vocabulary (JVM) vs the reference tokenizer (Python)
    wc = {r["word"]: r["count"] for r in word_counts(df).collect()}
    ref = Counter(w for t in texts for w in _ref_tokenize(t))
    assert wc == dict(ref)
    assert "foo " in wc and "bar baz" in wc
    # encode-side: every encoded word, rebuilt from its pieces, is a
    # fit-side vocabulary word (no boundary re-splitting)
    merges = bpe_fit(df, num_merges=6, merge_batch=1)
    enc = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_encode(df, merges).collect()
    }
    for i, t in enumerate(texts):
        rebuilt = [
            w + EOW for w in "".join(enc[i]).split(EOW) if w != ""
        ]
        words = ["".join(_ref_symbols(w)) for w in _ref_tokenize(t)]
        assert rebuilt == words, (i, t)
        assert enc[i] == _ref_encode(t, merges), (i, t)


# ------------------------------------------------------ token-id surface
class TestTokenIds:
    """bpe_vocab / bpe_encode_ids / bpe_decode_ids (round 11 — the
    trainer-input form): ids are a pure function of (merges, base
    symbols); the id encoder is the string encoder mapped through the
    vocab (shared kernel); decode(ids) round-trips to whitespace-
    normalized text; out-of-alphabet text is loud via n_unk, never
    silent."""

    TEXTS = [
        "low lower lowest",
        "new newer newest  spaced\tout",
        "low low low newer",
    ]

    def _fit(self, spark):
        from gus_spark.operators.bpe import (
            bpe_base_symbols,
            bpe_vocab,
        )

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)],
            "doc_id long, text string",
        )
        merges = bpe_fit(df, num_merges=8, merge_batch=1)
        vocab = bpe_vocab(merges, bpe_base_symbols(df))
        return df, merges, vocab

    def test_vocab_is_deterministic_and_total(self, spark):
        from gus_spark.operators.bpe import UNK, bpe_vocab

        df, merges, vocab = self._fit(spark)
        assert vocab[UNK] == 0
        assert sorted(vocab.values()) == list(range(len(vocab)))
        # every merge output and every seed symbol is mapped
        for a, b in merges:
            assert (a + b) in vocab
        # rebuild gives the identical mapping
        _df2, merges2, vocab2 = self._fit(spark)
        assert merges2 == merges and vocab2 == vocab

    def test_ids_equal_strings_through_vocab(self, spark):
        from gus_spark.operators.bpe import bpe_encode_ids

        df, merges, vocab = self._fit(spark)
        strs = {
            r.doc_id: list(r.tokens)
            for r in bpe_encode(df, merges).collect()
        }
        ids = {
            r.doc_id: (list(r.token_ids), r.n_tokens, r.n_unk)
            for r in bpe_encode_ids(df, merges, vocab).collect()
        }
        for d, toks in strs.items():
            got_ids, n_tokens, n_unk = ids[d]
            assert got_ids == [vocab[t] for t in toks], d
            assert n_tokens == len(toks) and n_unk == 0

    def test_decode_round_trips(self, spark):
        from gus_spark.operators.bpe import (
            bpe_decode_ids,
            bpe_encode_ids,
        )

        df, merges, vocab = self._fit(spark)
        rows = {
            r.doc_id: list(r.token_ids)
            for r in bpe_encode_ids(df, merges, vocab).collect()
        }
        for i, t in enumerate(self.TEXTS):
            want = " ".join(
                w for w in re.split(r"\s+", t, flags=re.ASCII) if w
            )
            assert bpe_decode_ids(rows[i], vocab) == want, i

    def test_unseen_chars_are_loud_unks(self, spark):
        import pytest

        from gus_spark.operators.bpe import (
            bpe_decode_ids,
            bpe_encode_ids,
        )

        df, merges, vocab = self._fit(spark)
        alien = spark.createDataFrame(
            [(99, "low über")], "doc_id long, text string"
        )
        r = bpe_encode_ids(alien, merges, vocab).first()
        assert r.n_unk > 0 and 0 in list(r.token_ids)
        with pytest.raises(ValueError, match="not decodable"):
            bpe_decode_ids(list(r.token_ids), vocab)

    def test_validation(self, spark):
        import pytest

        from gus_spark.operators.bpe import bpe_encode_ids

        df, merges, _vocab = self._fit(spark)
        with pytest.raises(ValueError, match="UNK"):
            bpe_encode_ids(df, merges, {"a": 1})

    def test_token_id_shards_feed_the_loader(self, spark, tmp_path):
        """The composition VERDICT r10 asked for: encode to ids, carry
        the token_ids column through write_training_shards, stream it
        back in training order, and decode — the loader's batches ARE
        trainer input."""
        from gus_spark.operators.bpe import (
            bpe_decode_ids,
            bpe_encode_ids,
        )
        from gus_spark.operators.splits import (
            iter_training_order,
            write_training_shards,
        )

        df, merges, vocab = self._fit(spark)
        enc = bpe_encode_ids(df, merges, vocab)
        dest = str(tmp_path / "tok_shards")
        manifest = write_training_shards(
            enc, dest, shards=2, weights={"train": 1.0}, verify=False
        )
        assert manifest["total_rows"] == len(self.TEXTS)
        texts = dict(enumerate(self.TEXTS))
        seen = 0
        for batch, _cur in iter_training_order(dest, "train"):
            for row in batch.to_pylist():
                want = " ".join(
                    w
                    for w in re.split(
                        r"\s+", texts[row["doc_id"]], flags=re.ASCII
                    )
                    if w
                )
                assert bpe_decode_ids(row["token_ids"], vocab) == want
                assert row["n_tokens"] == len(row["token_ids"])
                seen += 1
        assert seen == len(self.TEXTS)


class TestByteFallback:
    """bpe_vocab(byte_fallback=True) (r12, VERDICT r11 ask #3): the
    GPT-2/SentencePiece guarantee — encoding is TOTAL (any input,
    zero UNK) and decode round-trips exactly, with ids 1..256 reserved
    for the byte alphabet. unk_rate then reads as fallback rate."""

    ALIEN_TEXTS = [
        "low 日本語のテキスト lower",        # CJK against an EN fit
        "emoji 🎉🚀 mixed",
        "παράδειγμα ñandú Привет",
        "tabs\tand  runs   of spaces",
    ]

    def _fit_fb(self, spark):
        from gus_spark.operators.bpe import (
            bpe_base_symbols,
            bpe_vocab,
        )

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(TestTokenIds.TEXTS)],
            "doc_id long, text string",
        )
        merges = bpe_fit(df, num_merges=8, merge_batch=1)
        vocab = bpe_vocab(
            merges, bpe_base_symbols(df), byte_fallback=True
        )
        return df, merges, vocab

    def test_vocab_layout(self, spark):
        from gus_spark.operators.bpe import (
            _BYTE_TOKENS,
            UNK,
            bpe_vocab,
        )

        _df, merges, vocab = self._fit_fb(spark)
        assert vocab[UNK] == 0
        for b in range(256):
            assert vocab[_BYTE_TOKENS[b]] == 1 + b
        assert sorted(vocab.values()) == list(range(len(vocab)))
        # text ids start past the byte block
        assert min(
            i for s, i in vocab.items()
            if s != UNK and s not in _BYTE_TOKENS
        ) == 257
        # deterministic rebuild
        _df2, merges2, vocab2 = self._fit_fb(spark)
        assert merges2 == merges and vocab2 == vocab

    def test_total_encode_round_trips_any_input(self, spark):
        """Out-of-alphabet text (emoji/CJK/Greek against an English
        fit) encodes with zero UNKs — n_unk counts fallback BYTES —
        and decodes back to the whitespace-normalized original
        exactly. The done-criterion of VERDICT r11 #3."""
        from gus_spark.operators.bpe import (
            bpe_decode_ids,
            bpe_encode_ids,
        )

        _df, merges, vocab = self._fit_fb(spark)
        alien = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.ALIEN_TEXTS)],
            "doc_id long, text string",
        )
        rows = {
            r.doc_id: r
            for r in bpe_encode_ids(alien, merges, vocab).collect()
        }
        for i, t in enumerate(self.ALIEN_TEXTS):
            r = rows[i]
            ids = list(r.token_ids)
            assert 0 not in ids, i          # UNK never emitted
            assert r.n_unk > 0, i           # fallback is loud
            assert r.n_unk == sum(1 <= x <= 256 for x in ids), i
            want = " ".join(
                w for w in re.split(r"\s+", t, flags=re.ASCII) if w
            )
            assert bpe_decode_ids(ids, vocab) == want, i

    def test_in_vocab_text_unaffected(self, spark):
        """Covered text encodes to the same token STRINGS as the
        non-fallback vocab (ids shift by the 256-slot byte block) with
        n_unk == 0 — fallback only changes the out-of-vocab path."""
        from gus_spark.operators.bpe import bpe_encode_ids

        df, merges, vocab = self._fit_fb(spark)
        strs = {
            r.doc_id: list(r.tokens)
            for r in bpe_encode(df, merges).collect()
        }
        for r in bpe_encode_ids(df, merges, vocab).collect():
            assert list(r.token_ids) == [
                vocab[t] for t in strs[r.doc_id]
            ]
            assert r.n_unk == 0

    def test_reserved_byte_token_string_never_aliases(self, spark):
        """A merge chain whose output spells a byte-token literal
        ('<0x41>') gets NO text id: the encoder byte-decomposes that
        symbol, so byte ids never alias corpus text and the round
        trip stays exact."""
        from gus_spark.operators.bpe import (
            bpe_decode_ids,
            bpe_encode_ids,
            bpe_vocab,
        )

        merges = [
            ("<", "0"), ("<0", "x"), ("<0x", "4"), ("<0x4", "1"),
            ("<0x41", ">"),
        ]
        base = list("<0x41>z") + ["z</w>"]
        vocab = bpe_vocab(merges, base, byte_fallback=True)
        assert vocab["<0x41>"] == 1 + 0x41  # the BYTE token holds it
        df = spark.createDataFrame(
            [(0, "<0x41>z")], "doc_id long, text string"
        )
        r = bpe_encode_ids(df, merges, vocab).first()
        ids = list(r.token_ids)
        # the merged '<0x41>' symbol decomposed to ITS OWN bytes —
        # the 'A' byte id (66) that the literal would alias is absent
        assert (1 + 0x41) not in ids
        assert bpe_decode_ids(ids, vocab) == "<0x41>z"

    def test_partial_byte_alphabet_is_loud(self, spark):
        from gus_spark.operators.bpe import (
            _BYTE_TOKENS,
            bpe_decode_ids,
            bpe_encode_ids,
        )

        df, merges, vocab = self._fit_fb(spark)
        broken = dict(vocab)
        del broken[_BYTE_TOKENS[7]]
        with pytest.raises(ValueError, match="byte-fallback"):
            bpe_encode_ids(df, merges, broken)
        with pytest.raises(ValueError, match="byte-fallback"):
            bpe_decode_ids([1], broken)

    def test_plain_vocab_with_byte_token_text_not_fallback(
        self, spark, tmp_path
    ):
        """r13 (ADVICE r12 #2): a PLAIN vocab fit on a hexdump/code
        corpus can legitimately contain a merge output spelling the
        literal text '<0x41>' at an ordinary text id — that is corpus
        text, not a fallback alphabet. The discriminator is the
        reserved id range ('<0x00>' at id 1), so such a vocab must
        encode/decode/save as a plain vocab, not raise 'partial or
        displaced byte-fallback alphabet'."""
        from gus_spark.operators.bpe import (
            bpe_decode_ids,
            bpe_encode_ids,
            bpe_vocab,
            load_tokenizer,
            save_tokenizer,
        )

        merges = [
            ("<", "0"), ("<0", "x"), ("<0x", "4"), ("<0x4", "1"),
            ("<0x41", ">"),
        ]
        base = list("<0x41>z") + ["z</w>"]
        vocab = bpe_vocab(merges, base)  # NO byte_fallback
        assert "<0x41>" in vocab and vocab.get("<0x00>") is None
        df = spark.createDataFrame(
            [(0, "<0x41>z")], "doc_id long, text string"
        )
        r = bpe_encode_ids(df, merges, vocab).first()
        ids = list(r.token_ids)
        assert r.n_unk == 0  # the literal encodes via its TEXT id
        assert vocab["<0x41>"] in ids
        assert bpe_decode_ids(ids, vocab) == "<0x41>z"
        save_tokenizer(str(tmp_path), merges, vocab)
        m2, v2 = load_tokenizer(str(tmp_path))
        assert (m2, v2) == (merges, vocab)

    def test_invalid_byte_run_replaces_not_raises(self, spark):
        """decode is never-raising on byte runs: a hand-crafted
        invalid UTF-8 run (lone 0xFF) decodes with U+FFFD replacement
        (encoder output can never produce one — it decomposes whole
        symbols — but a corrupt shard must not kill the loader)."""
        from gus_spark.operators.bpe import bpe_decode_ids

        _df, _merges, vocab = self._fit_fb(spark)
        assert bpe_decode_ids([1 + 0xFF], vocab) == "�"

    def test_fertility_unk_rate_reads_as_fallback_rate(self, spark):
        """The EN-fit-on-zh degenerate signal survives fallback: the
        zh group reads unk_rate 1.0 (every token is a fallback byte)
        while en stays 0.0 — same mis-fit flag, total encoding."""
        from gus_spark.operators.bpe import (
            bpe_base_symbols,
            bpe_fertility,
            bpe_vocab,
        )

        en = spark.createDataFrame(
            [(i, "en", t) for i, t in enumerate(TestTokenIds.TEXTS)],
            "doc_id long, lang string, text string",
        )
        zh = spark.createDataFrame(
            [(100, "zh", "日本語 テキスト"), (101, "zh", "中文 文本")],
            "doc_id long, lang string, text string",
        )
        merges = bpe_fit(en, num_merges=8, merge_batch=1)
        vocab = bpe_vocab(
            merges, bpe_base_symbols(en), byte_fallback=True
        )
        stats = {
            r["lang"]: r.asDict()
            for r in bpe_fertility(
                en.unionByName(zh), merges, vocab, by="lang"
            ).collect()
        }
        assert stats["en"]["unk_rate"] == 0.0
        assert stats["zh"]["unk_rate"] == 1.0
        assert stats["en"]["fertility"] < stats["zh"]["fertility"]


class TestVocabSizeTarget:
    """bpe_fit(vocab_size=) (r12): the production knob — stop the fit
    when the TEXT vocabulary (UNK + base symbols + merge outputs)
    reaches a target, exactly."""

    def _corpus(self, spark):
        from gus_spark.queries import table

        from conftest import SF_DIR_ORACLE

        return (
            table(spark, SF_DIR_ORACLE, "documents")
            .select("doc_id", "text")
            .limit(120)
        )

    def test_hits_the_target_exactly(self, spark):
        from gus_spark.operators.bpe import (
            bpe_base_symbols,
            bpe_vocab,
        )

        df = self._corpus(spark)
        base = bpe_base_symbols(df)
        floor = 1 + len(base)
        target = floor + 17
        stats: dict = {}
        merges = bpe_fit(df, vocab_size=target, stats=stats)
        vocab = bpe_vocab(merges, base)
        assert len(vocab) == target == stats["vocab_size"]
        # byte fallback adds its 256 reserved ids ON TOP
        assert len(
            bpe_vocab(merges, base, byte_fallback=True)
        ) == target + 256
        # prefix property: the vocab_size-targeted merge list is a
        # PREFIX of the pure-merge-count fit (same corpus, same
        # admission order — the knob only changes where it stops)
        full = bpe_fit(df, num_merges=len(merges) + 8)
        assert full[: len(merges)] == merges

    def test_both_knobs_whichever_binds(self, spark):
        df = self._corpus(spark)
        # merge cap binds first
        m1 = bpe_fit(df, num_merges=3, vocab_size=10_000)
        assert len(m1) == 3
        # vocab cap binds first: merges < the generous merge cap
        from gus_spark.operators.bpe import (
            bpe_base_symbols,
            bpe_vocab,
        )

        base = bpe_base_symbols(df)
        m2 = bpe_fit(
            df, num_merges=500, vocab_size=1 + len(base) + 5
        )
        assert len(bpe_vocab(m2, base)) == 1 + len(base) + 5
        assert len(m2) < 500

    def test_validation_and_default(self, spark):
        from gus_spark.operators.bpe import bpe_base_symbols

        df = self._corpus(spark)
        floor = 1 + len(bpe_base_symbols(df))
        with pytest.raises(ValueError, match="base alphabet"):
            bpe_fit(df, vocab_size=floor)
        with pytest.raises(ValueError, match="num_merges"):
            bpe_fit(df, num_merges=0)

    def test_fertility_stop(self, spark):
        """fertility_stop (r12): the fit halts when a round's relative
        tokens/word improvement on the held-out probe falls below the
        threshold — before a generous merge budget; the history is
        monotone non-increasing; the merge list stays a prefix of the
        unrestricted fit; an impossible threshold stops after round 1
        (the first measurable gain)."""
        df = self._corpus(spark)
        stats: dict = {}
        # threshold calibrated to the salted testdata's gain profile:
        # per-round gains run ~9-15% while the small core vocabulary
        # merges, dipping under 5% just before pair exhaustion — 0.05
        # stops there; a lower floor would hit "pairs" first
        merges = bpe_fit(
            df, num_merges=400, fertility_stop=0.05, stats=stats,
        )
        assert stats["stopped_by"] == "fertility"
        assert len(merges) < 400
        hist = stats["fertility"]
        assert len(hist) >= 2
        assert all(a >= b for a, b in zip(hist, hist[1:]))
        full = bpe_fit(df, num_merges=len(merges) + 8)
        assert full[: len(merges)] == merges
        # threshold no round can beat -> stops at the second probe
        s2: dict = {}
        bpe_fit(df, num_merges=400, fertility_stop=0.999, stats=s2)
        assert s2["stopped_by"] == "fertility"
        assert len(s2["fertility"]) == 2
        with pytest.raises(ValueError, match="fertility_stop"):
            bpe_fit(df, fertility_stop=0.0)


class TestTokenizerArtifact:
    """save_tokenizer / load_tokenizer (r12): the tokenizer model
    persisted next to the shard manifest completes the trainer
    boundary — shards + tokenizer.json reconstruct the training input
    with no live fit. Round trip is exact; invariant violations and
    edits are loud."""

    def test_round_trip_both_tiers(self, spark, tmp_path):
        from gus_spark.operators.bpe import (
            bpe_base_symbols,
            bpe_vocab,
            load_tokenizer,
            save_tokenizer,
        )

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(TestTokenIds.TEXTS)],
            "doc_id long, text string",
        )
        merges = bpe_fit(df, num_merges=8, merge_batch=1)
        base = bpe_base_symbols(df)
        for fb in (False, True):
            vocab = bpe_vocab(merges, base, byte_fallback=fb)
            d = str(tmp_path / f"tok_{fb}")
            os.makedirs(d)
            receipt = save_tokenizer(d, merges, vocab)
            assert receipt == {
                "vocab_size": len(vocab),
                "n_merges": len(merges),
                "byte_fallback": fb,
            }
            m2, v2 = load_tokenizer(d)
            assert m2 == merges and v2 == vocab

    def test_edited_artifacts_are_loud(self, spark, tmp_path):
        import json

        from gus_spark.operators.bpe import (
            UNK,
            bpe_base_symbols,
            bpe_vocab,
            load_tokenizer,
            save_tokenizer,
        )

        df = spark.createDataFrame(
            [(0, "low lower")], "doc_id long, text string"
        )
        merges = bpe_fit(df, num_merges=2)
        vocab = bpe_vocab(merges, bpe_base_symbols(df))
        d = str(tmp_path / "tok")
        os.makedirs(d)
        save_tokenizer(d, merges, vocab)
        path = os.path.join(d, "tokenizer.json")
        good = json.load(open(path))

        def write(doc):
            json.dump(doc, open(path, "w"))

        write({**good, "version": 99})
        with pytest.raises(ValueError, match="version"):
            load_tokenizer(d)
        gapped = dict(good["vocab"])
        some = next(s for s in gapped if s != UNK)
        gapped[some] = len(gapped) + 5  # gap the id space
        write({**good, "vocab": gapped})
        with pytest.raises(ValueError, match="contiguous"):
            load_tokenizer(d)
        write({**good, "byte_fallback": True})  # flag vs actual vocab
        with pytest.raises(ValueError, match="byte_fallback"):
            load_tokenizer(d)
        # save-side guard too: UNK displaced
        bad = {s: i + 1 if s == UNK else i for s, i in vocab.items()}
        with pytest.raises(ValueError, match="id 0"):
            save_tokenizer(d, merges, bad)


class TestFertility:
    """bpe_fertility (r11): per-group tokenizer health vs a pure-Python
    twin (the shared _enc_text kernel run host-side), and the signal —
    a vocab fit on one group encodes a disjoint-alphabet group near
    character level with a loud unk_rate."""

    def test_matches_python_twin(self, spark):
        from gus_spark.operators.bpe import (
            UNK,
            _enc_text,
            bpe_base_symbols,
            bpe_fertility,
            bpe_fit,
            bpe_vocab,
        )

        rows = [
            (0, "en", "low lower lowest low low"),
            (1, "en", "new newer newest"),
            (2, "de", "niedrig niedriger am niedrigsten"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        merges = bpe_fit(df, num_merges=6, merge_batch=1)
        vocab = bpe_vocab(merges, bpe_base_symbols(df))
        got = {
            r.lang: r.asDict()
            for r in bpe_fertility(df, merges, vocab).collect()
        }
        rk = {p: i for i, p in enumerate(merges)}
        want: dict[str, dict] = {}
        for _i, lang, t in rows:
            toks = _enc_text(t, rk)
            words = [w for w in t.split() if w]
            d = want.setdefault(
                lang, {"docs": 0, "words": 0, "tokens": 0, "chars": 0,
                       "unks": 0}
            )
            d["docs"] += 1
            d["words"] += len(words)
            d["tokens"] += len(toks)
            d["chars"] += len(t)
            d["unks"] += sum(1 for s in toks if s not in vocab)
        for lang, w in want.items():
            g = got[lang]
            assert g["n_docs"] == w["docs"]
            assert g["n_words"] == w["words"]
            assert g["n_tokens"] == w["tokens"]
            assert g["fertility"] == pytest.approx(
                w["tokens"] / w["words"]
            )
            assert g["chars_per_token"] == pytest.approx(
                w["chars"] / w["tokens"]
            )
            assert g["unk_rate"] == pytest.approx(
                w["unks"] / w["tokens"]
            )

    def test_flags_out_of_alphabet_group(self, spark):
        from gus_spark.operators.bpe import (
            bpe_base_symbols,
            bpe_fertility,
            bpe_fit,
            bpe_vocab,
        )

        en = spark.createDataFrame(
            [(i, "en", "the lower the better the lowest the best")
             for i in range(6)],
            "doc_id long, lang string, text string",
        )
        zh = spark.createDataFrame(
            [(100 + i, "zh", "好 好的 更好 最好") for i in range(6)],
            "doc_id long, lang string, text string",
        )
        merges = bpe_fit(en, num_merges=16, merge_batch=1)
        vocab = bpe_vocab(merges, bpe_base_symbols(en))  # EN-only fit
        stats = {
            r.lang: r.asDict()
            for r in bpe_fertility(en.unionByName(zh), merges, vocab)
            .collect()
        }
        # the fitted group compresses; the alien group is all-unk and
        # near character level — both signals loud
        assert stats["en"]["unk_rate"] == 0.0
        assert stats["en"]["fertility"] < stats["zh"]["fertility"]
        assert stats["zh"]["unk_rate"] == 1.0

    def test_degenerate_group_reports_null_not_divide_by_zero(self, spark):
        """A group whose only docs are whitespace-only aggregates 0
        words / 0 tokens: under ANSI mode the ratios must come back
        NULL (try_divide), never a DIVIDE_BY_ZERO job failure."""
        from gus_spark.operators.bpe import (
            bpe_base_symbols,
            bpe_fertility,
            bpe_fit,
            bpe_vocab,
        )

        fit_df = spark.createDataFrame(
            [(0, "en", "low lower lowest")],
            "doc_id long, lang string, text string",
        )
        merges = bpe_fit(fit_df, num_merges=4, merge_batch=1)
        vocab = bpe_vocab(merges, bpe_base_symbols(fit_df))
        mixed = spark.createDataFrame(
            [(0, "en", "low lower lowest"), (1, "xx", "   ")],
            "doc_id long, lang string, text string",
        )
        rows = {
            r.lang: r.asDict()
            for r in bpe_fertility(mixed, merges, vocab).collect()
        }
        assert rows["xx"]["n_words"] == 0 and rows["xx"]["n_tokens"] == 0
        assert rows["xx"]["fertility"] is None
        assert rows["xx"]["unk_rate"] is None
        assert rows["en"]["fertility"] is not None
