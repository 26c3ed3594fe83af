"""Byte-pair-encoding tokenizer training and encoding (Sennrich et
al. 2016, arXiv 1508.07909 — the LLM-tokenizer core algorithm).

The scale trick is the classic one: BPE statistics depend only on the
corpus VOCABULARY (distinct words + frequencies), not the corpus — so
the fit runs one corpus-sized aggregation (word counts), then
iterates on the resulting vocab frame, which is orders of magnitude
smaller (Heaps' law) and stays distributed:

    per round (one pass over the VOCAB, not the corpus):
      1. explode each word's adjacent symbol pairs weighted by the
         word's count; groupBy pair → sum — map-side partial agg, the
         shuffle moves |distinct pairs| rows;
      2. collect the top candidate pairs driver-side (bounded:
         ``4 × merge_batch`` rows; deterministic order — count desc,
         then lowest (left, right) lexicographically);
      3. greedily admit up to ``merge_batch`` NON-CONFLICTING pairs
         from that list (the standard parallel-BPE rule — see
         ``_admit_batch``), and apply them all, in rank order, in ONE
         Arrow kernel pass (a linear adjacent-pair scan per word per
         merge; no shuffle).

    With ``merge_batch=1`` this is exactly classic sequential BPE.
    With ``merge_batch=k`` the driver round-trip count — the fit's
    latency floor, O(num_merges) jobs regardless of cluster size —
    drops to O(num_merges / admitted-per-round). The trade, shared by
    every parallel-BPE trainer: pair counts are frozen within a round,
    so a batch member is chosen by its PRE-batch count. Counts of
    admitted (symbol-disjoint) pairs are EXACT under sequential
    replay — an earlier batch merge cannot change them — but classic
    BPE might instead have picked a pair the batch skipped (one whose
    count only DECREASES under the earlier merges, or a brand-new
    compound pair involving a just-merged token). Both fits are valid
    BPE tokenizers; the merge lists can differ. The conflict rule and
    the exactness of admitted counts are asserted in tests/test_bpe.py.

`bpe_encode` tokenizes any text with a fitted merge list: the
standard rank-greedy loop (repeatedly merge the best-ranked adjacent
pair) per word, vectorized per Arrow batch, merge table broadcast.
End-of-word is marked with the trailing sentinel ``</w>`` on the last
character, per the paper, so "low" and "lower" share prefixes but not
the terminal symbol.

Everything is deterministic: no RNG, stable tie-breaks, and the fit
depends only on the word-count multiset — identical merges across
runs and partitionings (tested against a pure-Python reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gus_spark.functions.tokenize import tokenize

EOW = "</w>"


def _word_symbols(word: str) -> list[str]:
    if not word:
        return []
    chars = list(word)
    chars[-1] = chars[-1] + EOW
    return chars


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over whitespace tokens — the corpus-sized pass."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.explode(tokenize(F.col(text_col))).alias(
                "word"
            )
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def _admit_batch(
    candidates: list[tuple[str, str, int]], limit: int
) -> list[tuple[str, str]]:
    """Greedy non-conflicting batch admission (the standard
    parallel-BPE rule). ``candidates`` arrive in rank order (count
    desc, then lexicographic). A candidate ``(a, b)`` conflicts with
    an earlier admitted merge when any of ``a``, ``b``, or its output
    token ``a + b`` collides with an admitted pair's symbols OR output:

    - shared SYMBOL → the earlier merge consumes/creates occurrences
      of it, so the candidate's frozen count is stale (and a one-pass
      simultaneous application would diverge from sequential replay);
    - output collision (``a + b`` equals an admitted symbol/output, or
      an admitted output equals ``a`` or ``b``) → string-equal tokens
      from different merges would alias in later rounds' counts.

    Admitted pairs are therefore pairwise symbol-disjoint, which is
    what makes their frozen counts EXACT under sequential replay of
    the batch. The first candidate is always admitted → progress is
    guaranteed every round."""
    admitted: list[tuple[str, str]] = []
    used: set[str] = set()
    for a, b, _n in candidates:
        if len(admitted) >= limit:
            break
        if a in used or b in used or (a + b) in used:
            continue
        admitted.append((a, b))
        used.update((a, b, a + b))
    return admitted


def bpe_fit(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int | None = None,
    checkpoint_every: int = 8,
    merge_batch: int = 8,
    stats: dict | None = None,
    vocab_size: int | None = None,
    fertility_stop: float | None = None,
    fertility_sample: int = 256,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merge rules from the corpus; returns the
    ordered merge list (the whole tokenizer model — rank = position).
    Stops early when no adjacent pair repeats.

    Per-round cost on a small vocab is JOB LATENCY, not data (measured
    ~0.5 s per driver round-trip at every testdata decade). Two
    orthogonal amortizations attack it:

    - ``merge_batch``: admit up to k non-conflicting merges per
      driver round-trip (see module docstring and ``_admit_batch``).
      ``merge_batch=1`` recovers exact classic sequential BPE. The
      collect stays bounded: ``4 × merge_batch`` rows per round.
    - ``checkpoint_every``: amortize the eager lineage-truncation
      checkpoint over that many MERGES instead of paying one per
      round. The trade is QUADRATIC within the window: a round with w
      merges pending since the last checkpoint re-executes those
      kernels inside its pair-count job, so keep windows modest — the
      measured optimum at merge_batch=1 was 8 (cadence sweep 1/4/8/16
      → 14.5/12.7/11.7/13.4 s for a 32-merge sf0.1 fit); batching
      makes the window a round count so the quadratic term shrinks
      too. Capped at 32 because large windows make the fit SLOWER.

    Stopping (r12): ``num_merges`` bounds the merge count (the
    classic knob); ``vocab_size`` bounds the resulting TEXT
    vocabulary instead — the production knob ("fit a 32k tokenizer"):
    the fit stops exactly when 1 (UNK) + |base symbols| + distinct
    merge outputs reaches it, truncating the final batch mid-round if
    needed, so ``len(bpe_vocab(merges, base))`` == vocab_size on any
    corpus with enough repeating pairs (early pair exhaustion stops
    below it, loudly countable via stats). A byte-fallback vocab adds
    its 256 reserved ids ON TOP of this target. Give either knob or
    both (both = whichever binds first); neither = the historical
    default of 100 merges. The base-alphabet count costs one extra
    alphabet-sized collect at fit start, only when vocab_size is set.

    ``fertility_stop`` (r12, the data-driven stop): after each round,
    re-encode a fixed held-out probe (``fertility_sample`` documents,
    hash-ordered so the sample is deterministic across partitionings;
    collected ONCE, re-encoded host-side through the shared
    `_enc_word` kernel — no extra Spark jobs per round) and stop when
    the round's relative tokens-per-word improvement falls below the
    threshold — merges that no longer compress the corpus aren't
    worth vocab slots. Composes with the other knobs (whichever binds
    first); the probe history lands in ``stats["fertility"]``.

    Pass a dict as ``stats`` to receive ``{"rounds": R, "merges": M,
    "batch_sizes": [...], "vocab_size": V, "fertility": [...],
    "stopped_by": "merges" | "vocab_size" | "fertility" | "pairs"}``
    — rounds == driver round-trips; V = the text-vocab size the merge
    list implies (vocab_size knob only); fertility/stopped_by appear
    with their knobs."""
    if num_merges is None and vocab_size is None:
        num_merges = 100
    if num_merges is not None and num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    if not 1 <= checkpoint_every <= 32:
        raise ValueError(
            "checkpoint_every must be in [1, 32] (window cost is "
            f"quadratic — see docstring), got {checkpoint_every}"
        )
    if not 1 <= merge_batch <= 64:
        raise ValueError(
            f"merge_batch must be in [1, 64], got {merge_batch}"
        )
    import pandas as pd

    vocab = word_counts(df, text_col)

    # symbol arrays seeded from characters (+ terminal sentinel);
    # Arrow-batched like every Python stage in this repo
    @F.pandas_udf("array<string>")
    def to_syms(words):
        return pd.Series([_word_symbols(w) for w in words])

    # the vocab frame is iterated on; localCheckpoint truncates the
    # growing lineage (the MinHash/graph pattern), amortized every
    # `checkpoint_every` merges
    cur = vocab.select(
        to_syms("word").alias("syms"), "count"
    ).localCheckpoint()

    # vocab-size targeting: track every known token string (base
    # symbols + merge outputs); text-vocab size = 1 (UNK) + |known|.
    # The base collect is alphabet-sized — same bound bpe_base_symbols
    # documents — and paid only when the knob is used.
    known: set[str] | None = None
    if vocab_size is not None:
        known = {
            r["sym"]
            for r in cur.select(
                F.explode("syms").alias("sym")
            )
            .distinct()
            .collect()
        }
        floor = 1 + len(known)
        if vocab_size <= floor:
            raise ValueError(
                "vocab_size must exceed UNK + the base alphabet "
                f"({floor}), got {vocab_size}"
            )

    # fertility probe: one deterministic sample collect up front,
    # then a host-side re-encode per round through the shared kernel
    probe_words: list[str] | None = None
    fert_hist: list[float] = []
    if fertility_stop is not None:
        if not 0 < fertility_stop < 1:
            raise ValueError(
                "fertility_stop is a relative improvement threshold "
                f"in (0, 1), got {fertility_stop}"
            )
        import re as _re

        sample = (
            df.filter(F.col(text_col).isNotNull())
            .select(F.col(text_col).alias("_t"))
            .orderBy(F.md5(F.col("_t")), F.col("_t"))
            .limit(fertility_sample)
            .collect()
        )
        probe_words = [
            w
            for r in sample
            for w in _re.split(r"\s+", r["_t"], flags=_re.ASCII)
            if w
        ]
        if not probe_words:
            raise ValueError(
                "fertility probe sample holds no words — corpus "
                "empty or whitespace-only"
            )

    stopped_by: str | None = None

    def want_more() -> bool:
        nonlocal stopped_by
        if num_merges is not None and len(merges) >= num_merges:
            stopped_by = "merges"
            return False
        if known is not None and 1 + len(known) >= vocab_size:
            stopped_by = "vocab_size"
            return False
        return True

    merges: list[tuple[str, str]] = []
    batch_sizes: list[int] = []
    rounds = 0  # EVERY pair-count collect, incl. the empty final one
    since_checkpoint = 0
    while want_more():
        pairs = (
            cur.select(
                F.posexplode(F.slice("syms", 1, F.size("syms") - 1)).alias(
                    "i", "left"
                ),
                F.col("syms"),
                F.col("count"),
            )
            .select(
                "left",
                F.element_at("syms", F.col("i") + 2).alias("right"),
                "count",
            )
            .groupBy("left", "right")
            .agg(F.sum("count").alias("n"))
            .filter(F.col("n") >= 2)
        )
        top = pairs.orderBy(
            F.desc("n"), F.asc("left"), F.asc("right")
        ).limit(4 * merge_batch).collect()
        rounds += 1
        if not top:
            stopped_by = "pairs"
            break
        lim = (
            merge_batch
            if num_merges is None
            else min(merge_batch, num_merges - len(merges))
        )
        batch = _admit_batch(
            [(r["left"], r["right"], r["n"]) for r in top], lim
        )
        if known is not None:
            # truncate at the vocab boundary: a NEW output costs one
            # vocab slot; a duplicate output (second merge path to an
            # existing string) costs none and is kept
            kept: list[tuple[str, str]] = []
            for a, b in batch:
                if (
                    (a + b) not in known
                    and 1 + len(known) >= vocab_size
                ):
                    break
                kept.append((a, b))
                known.add(a + b)
            batch = kept
        merges.extend(batch)
        batch_sizes.append(len(batch))
        if not batch:  # truncated to nothing: target reached exactly
            stopped_by = "vocab_size"
            break

        def make_apply(batch=batch):
            @F.pandas_udf("array<string>")
            def apply_merges(col):
                def one(syms):
                    if syms is None:
                        return syms
                    # rank order; admitted pairs are symbol-disjoint,
                    # so this equals sequential replay of the batch
                    for a, b in batch:
                        if len(syms) < 2:
                            break
                        merged = a + b
                        out = []
                        i = 0
                        n = len(syms)
                        while i < n:
                            if (
                                i + 1 < n
                                and syms[i] == a
                                and syms[i + 1] == b
                            ):
                                out.append(merged)
                                i += 2
                            else:
                                out.append(syms[i])
                                i += 1
                        syms = out
                    return syms

                return pd.Series([one(s) for s in col])

            return apply_merges

        cur = cur.select(make_apply()("syms").alias("syms"), "count")
        since_checkpoint += len(batch)
        if since_checkpoint >= checkpoint_every:
            cur = cur.localCheckpoint()
            since_checkpoint = 0
        if probe_words is not None:
            rk = {pair: r for r, pair in enumerate(merges)}
            toks = sum(len(_enc_word(w, rk)) for w in probe_words)
            fert = toks / len(probe_words)
            gain = (
                (fert_hist[-1] - fert) / fert_hist[-1]
                if fert_hist and fert_hist[-1] > 0
                else None
            )
            fert_hist.append(fert)
            if gain is not None and gain < fertility_stop:
                stopped_by = "fertility"
                break
    if stats is not None:
        stats["rounds"] = rounds
        stats["merges"] = len(merges)
        stats["batch_sizes"] = batch_sizes
        if known is not None:
            stats["vocab_size"] = 1 + len(known)
        if probe_words is not None:
            stats["fertility"] = fert_hist
        if stopped_by is not None:
            stats["stopped_by"] = stopped_by
    return merges


def _enc_word(word: str, rk: dict) -> list[str]:
    """Rank-greedy merge loop for one word — shared by the string and
    token-id encoders so they can never drift."""
    syms = _word_symbols(word)
    while len(syms) >= 2:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = rk.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        # merge EVERY occurrence of that pair left-to-right,
        # mirroring the fit's full-array merge pass
        a, b = syms[best], syms[best + 1]
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _enc_text(t: str | None, rk: dict) -> list[str] | None:
    if t is None:
        return None
    import re

    toks = []
    # ASCII \s+ split + empty filter mirrors the fit's JVM
    # trim+split+filter exactly: Java \s == re.ASCII \s
    # ([ \t\n\x0B\f\r]), and NOT calling Python str.strip()
    # matters — strip() removes Unicode whitespace (U+00A0,
    # U+2028, ...) that the JVM pipeline keeps inside words,
    # so stripping would tokenize boundary words differently
    # from the vocabulary the fit counted (ADVICE r6).
    for w in re.split(r"\s+", t, flags=re.ASCII):
        if w:
            toks.extend(_enc_word(w, rk))
    return toks


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — rank-greedy BPE encoding
    of each document with a fitted merge list (unseen words fall back
    toward characters, the defining BPE property)."""
    ranks = {pair: r for r, pair in enumerate(merges)}
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(ranks)

    @F.pandas_udf("array<string>")
    def encode(texts):
        import pandas as pd

        rk = bc.value
        return pd.Series([_enc_text(t, rk) for t in texts])

    live = df.filter(F.col(text_col).isNotNull())
    return live.select(
        F.col(id_col),
        encode(F.col(text_col)).alias("tokens"),
    ).select(
        id_col, "tokens", F.size("tokens").cast("long").alias("n_tokens")
    )


# ------------------------------------------------------ token-id surface

#: id 0 — the out-of-vocabulary token. Present in every bpe_vocab, so
#: encoders can always emit SOMETHING for an unseen symbol (and the
#: n_unk column makes doing so loud rather than silent).
UNK = "<unk>"

#: byte-fallback alphabet (SentencePiece's convention: ``<0x00>`` …
#: ``<0xFF>``) — with ``bpe_vocab(byte_fallback=True)`` these occupy
#: ids 1..256 and any symbol outside the fitted vocab decomposes into
#: its UTF-8 bytes instead of UNK, making encode TOTAL (zero UNK on
#: any input) and decode never-raising on encoder output — the
#: GPT-2/SentencePiece byte-fallback guarantee.
_BYTE_TOKENS = tuple(f"<0x{i:02X}>" for i in range(256))

#: id of byte value b under byte fallback: bytes sit right after UNK
_BYTE_ID_BASE = 1


def _vocab_byte_fallback(vocab: dict[str, int]) -> bool:
    """Whether ``vocab`` carries the byte-fallback tier — all 256 byte
    tokens at their reserved contiguous ids (1..256, the bpe_vocab
    layout). The discriminator is the RESERVED ID RANGE, not the mere
    presence of byte-token-shaped strings (ADVICE r12 #2): a plain
    vocab fit on a hexdump/code corpus can legitimately contain a
    merge output spelling the literal text ``<0x41>`` at some
    ordinary text id — that is corpus text, not a fallback alphabet.
    Only when ``<0x00>`` sits at the reserved base id (bpe_vocab
    places it there and nothing else can: id 1 is the first base
    symbol, always a single character, never a 6-char byte-token
    string) is the vocab treated as fallback, and THEN the full
    contiguous block is validated — encoders map byte b to id 1+b
    arithmetically, so a partial or displaced block would emit ids
    that decode to the wrong bytes, and raises."""
    if vocab.get(_BYTE_TOKENS[0]) != _BYTE_ID_BASE:
        return False
    ids = [vocab.get(t) for t in _BYTE_TOKENS]
    if ids != list(range(_BYTE_ID_BASE, _BYTE_ID_BASE + 256)):
        raise ValueError(
            "vocab carries a partial or displaced byte-fallback "
            "alphabet — byte tokens must be all 256 of "
            "<0x00>..<0xFF> at contiguous ids 1..256 (use "
            "bpe_vocab(byte_fallback=True))"
        )
    return True


def bpe_base_symbols(df: DataFrame, text_col: str = "text") -> list[str]:
    """Sorted distinct SEED symbols of the corpus — each word's
    characters with the end-of-word sentinel on the last (exactly what
    `bpe_fit` seeds its vocab frame with, via the same helper). One
    explode + distinct over the word-count frame; the result is
    alphabet-sized (bounded at any corpus scale), so the collect is a
    handful of rows."""
    import pandas as pd

    @F.pandas_udf("array<string>")
    def to_syms(words):
        return pd.Series([_word_symbols(w) for w in words])

    rows = (
        word_counts(df, text_col)
        .select(F.explode(to_syms("word")).alias("sym"))
        .distinct()
        .collect()
    )
    return sorted(r["sym"] for r in rows)


def bpe_vocab(
    merges: list[tuple[str, str]],
    base_syms: list[str],
    byte_fallback: bool = False,
) -> dict[str, int]:
    """token string → integer id, deterministically: UNK gets 0, the
    sorted base symbols follow, then merge OUTPUTS in rank order
    (first occurrence wins — two merge paths can produce the same
    string, e.g. ('a','bc') and ('ab','c') both yield 'abc'). The
    mapping is a pure function of (merges, base symbols), so any
    engine/run reproduces identical ids.

    ``byte_fallback=True`` reserves ids 1..256 for the byte alphabet
    ``<0x00>``…``<0xFF>`` (base symbols and merge outputs follow from
    257): `bpe_encode_ids` then decomposes any symbol outside the
    fitted vocab into its UTF-8 bytes instead of UNK — encoding
    becomes TOTAL (emoji/CJK against an English fit still encode, and
    round-trip exactly through `bpe_decode_ids`), and `bpe_fertility`
    ``unk_rate`` reads as the FALLBACK rate. The byte-token strings
    are reserved: a merge output that happens to spell one (e.g. a
    corpus that literally contains ``<0x41>``) gets NO text id — the
    encoder byte-decomposes that symbol instead, so byte ids never
    alias corpus text."""
    vocab = {UNK: 0}
    if byte_fallback:
        for t in _BYTE_TOKENS:
            vocab[t] = len(vocab)
    for s in sorted(set(base_syms)):
        if s not in vocab:
            vocab[s] = len(vocab)
    for a, b in merges:
        out = a + b
        if out not in vocab:
            vocab[out] = len(vocab)
    return vocab


def bpe_encode_ids(
    df: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, token_ids array<int>, n_tokens, n_unk) — the trainer-ready
    form of `bpe_encode`: the identical rank-greedy tokenization
    (shared `_enc_text` kernel — the two encoders cannot drift) with
    each token mapped through the broadcast ``vocab``. Symbols outside
    the vocab become UNK's id with ``n_unk`` counting them per row, so
    out-of-alphabet text is observable, never silently mangled.

    With a byte-fallback vocab (`bpe_vocab(byte_fallback=True)`) the
    encoder is TOTAL: an out-of-vocab symbol decomposes into its
    UTF-8 bytes (ids 1..256) instead of UNK — no input can fail to
    encode, and `bpe_decode_ids` reassembles the exact text. ``n_unk``
    then counts the emitted fallback-byte TOKENS (the fallback-rate
    numerator `bpe_fertility` reports); UNK's id is never emitted.
    The text lookup excludes the reserved byte-token strings, so a
    corpus that literally contains ``<0x41>`` still round-trips (its
    symbols byte-decompose rather than alias byte ids).

    ``carry_cols`` pass through unchanged (the dsir_select
    convention) so callers keying on composite identities — e.g. the
    packer's (shard, seq_id, chunk_index) — don't need a join to get
    them back. Distributed and Arrow-batched like every encoder here
    — at 100 TB tokenization rides the corpus scan, one Python kernel
    pass, no shuffle."""
    if UNK not in vocab:
        raise ValueError(
            f"vocab must map the UNK sentinel {UNK!r} (use bpe_vocab)"
        )
    fallback = _vocab_byte_fallback(vocab)
    ranks = {pair: r for r, pair in enumerate(merges)}
    unk_id = vocab[UNK]
    # text-symbol lookup: under fallback the 256 byte-token strings
    # (and UNK) are RESERVED — never valid text lookups — so a merge
    # output spelling one falls through to byte decomposition
    reserved = {UNK, *(_BYTE_TOKENS if fallback else ())}
    text_vc = {s: i for s, i in vocab.items() if s not in reserved}
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((ranks, text_vc))

    @F.pandas_udf("array<int>")
    def encode_ids(texts):
        import pandas as pd

        rk, vc = bc.value

        def one(t):
            toks = _enc_text(t, rk)
            if toks is None:
                return None
            if not fallback:
                return [vc.get(s, unk_id) for s in toks]
            out = []
            for s in toks:
                i = vc.get(s)
                if i is None:
                    out.extend(
                        _BYTE_ID_BASE + b for b in s.encode("utf-8")
                    )
                else:
                    out.append(i)
            return out

        return pd.Series([one(t) for t in texts])

    # n_unk: UNK occurrences, or under fallback the byte-token id
    # range [1, 256] (exclusively byte tokens — text ids start at 257)
    if fallback:
        def is_unkish(x):
            return (x >= F.lit(_BYTE_ID_BASE)) & (
                x < F.lit(_BYTE_ID_BASE + 256)
            )
    else:
        def is_unkish(x):
            return x == F.lit(unk_id)

    live = df.filter(F.col(text_col).isNotNull())
    carry = [F.col(c) for c in carry_cols]
    return live.select(
        F.col(id_col),
        *carry,
        encode_ids(F.col(text_col)).alias("token_ids"),
    ).select(
        id_col,
        *carry_cols,
        "token_ids",
        F.size("token_ids").cast("long").alias("n_tokens"),
        F.size(
            F.filter("token_ids", is_unkish)
        ).cast("long").alias("n_unk"),
    )


def bpe_fertility(
    df: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    by: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer health per ``by`` group — the corpus metric that
    catches a mis-fit tokenizer BEFORE a training run pays for it
    (e.g. a vocab fit on English encoding another language near
    character level): one row per group with

    - ``fertility``        — BPE tokens per whitespace word (the
      standard metric; 1.0 = every word is one token, → word length
      as the fit degrades toward characters);
    - ``chars_per_token``  — compression (text chars, as Spark
      length(), per emitted token);
    - ``unk_rate``         — UNK tokens per token (out-of-alphabet
      text; nonzero means the BASE symbols don't cover the group).
      Under a byte-fallback vocab this is the FALLBACK rate —
      fallback-byte tokens per token — the same mis-fit signal with
      total encoding (a zh group against an English fit reads near
      1.0 either way, asserted in tests);
    - ``n_docs`` / ``n_words`` / ``n_tokens`` — the denominators.

    Word denominator is the 'words' tokenize variant (non-empty),
    matching the encoder's own per-word loop exactly. Scale shape:
    the encode rides the corpus scan (one Arrow pass, no shuffle);
    the only exchange is the per-group agg — a row per group."""
    from gus_spark.functions.tokenize import tokenize as _tok

    clobbered = {"_nw", "_nc"} & set(df.columns)
    if clobbered:  # the cap_per_group loud-collision convention
        raise ValueError(
            f"input already carries {sorted(clobbered)} — bpe_fertility "
            "derives these internally; rename or drop them first"
        )
    prepped = df.withColumn(
        "_nw", F.size(_tok(F.col(text_col), "words")).cast("long")
    ).withColumn("_nc", F.length(text_col).cast("long"))
    enc = bpe_encode_ids(
        prepped,
        merges,
        vocab,
        id_col=id_col,
        text_col=text_col,
        carry_cols=(by, "_nw", "_nc"),
    )
    return (
        enc.groupBy(by)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_nw").alias("n_words"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("_nc").alias("_chars"),
            F.sum("n_unk").alias("_unks"),
        )
        .select(
            by,
            "n_docs",
            "n_words",
            "n_tokens",
            # try_divide: a group of whitespace-only docs legitimately
            # aggregates 0 words / 0 tokens — report NULL ratios for
            # the degenerate group instead of raising DIVIDE_BY_ZERO
            # under ANSI mode (the session default)
            F.try_divide("n_tokens", "n_words").alias("fertility"),
            F.try_divide("_chars", "n_tokens").alias(
                "chars_per_token"
            ),
            F.try_divide("_unks", "n_tokens").alias("unk_rate"),
        )
    )


#: tokenizer artifact schema version
_TOKENIZER_VERSION = 1


def _check_vocab(vocab: dict[str, int]) -> bool:
    """The invariants every (merges, vocab) consumer here relies on:
    UNK at id 0, ids contiguous 0..n-1, and (when present) the full
    byte-fallback block at 1..256. Returns the fallback flag."""
    if vocab.get(UNK) != 0:
        raise ValueError(
            f"vocab must map the UNK sentinel {UNK!r} to id 0 "
            "(use bpe_vocab)"
        )
    if sorted(vocab.values()) != list(range(len(vocab))):
        raise ValueError(
            "vocab ids must be contiguous 0..n-1 — a gapped or "
            "duplicated id space silently misbinds token tensors"
        )
    return _vocab_byte_fallback(vocab)


def save_tokenizer(
    dest: str, merges: list[tuple[str, str]], vocab: dict[str, int]
) -> dict:
    """Persist the WHOLE tokenizer model as ``dest/tokenizer.json``
    (tmp + atomic rename, the shard-manifest pattern): the ordered
    merge list (rank = position — the model itself) and its id
    binding. Written next to a `write_training_shards` manifest this
    completes the trainer boundary — shards + tokenizer.json are the
    full reproducible training input; a trainer (or a later decode
    job) needs no live Spark fit to interpret the token-id tensors.
    Invariants are checked at save AND load (`_check_vocab`), so a
    hand-edited artifact fails loudly, never misbinds ids. Returns a
    small receipt dict (vocab_size, n_merges, byte_fallback)."""
    import json
    import os

    fallback = _check_vocab(vocab)
    doc = {
        "version": _TOKENIZER_VERSION,
        "merges": [[a, b] for a, b in merges],
        "vocab": dict(vocab),
        "byte_fallback": fallback,
    }
    tmp = os.path.join(dest, "tokenizer.json.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(doc, fh)
    os.replace(tmp, os.path.join(dest, "tokenizer.json"))
    return {
        "vocab_size": len(vocab),
        "n_merges": len(merges),
        "byte_fallback": fallback,
    }


def load_tokenizer(
    dest: str,
) -> tuple[list[tuple[str, str]], dict[str, int]]:
    """Inverse of `save_tokenizer`: (merges, vocab) from
    ``dest/tokenizer.json``, with the same invariant checks plus a
    version gate and a byte-fallback flag cross-check (a stored flag
    disagreeing with the vocab's actual byte block means the artifact
    was edited — loud, not misbound)."""
    import json
    import os

    with open(
        os.path.join(dest, "tokenizer.json"), encoding="utf-8"
    ) as fh:
        doc = json.load(fh)
    if doc.get("version") != _TOKENIZER_VERSION:
        raise ValueError(
            f"tokenizer.json version {doc.get('version')!r} != "
            f"{_TOKENIZER_VERSION} — refit or migrate the artifact"
        )
    merges = [tuple(m) for m in doc["merges"]]
    if not all(len(m) == 2 for m in merges):
        raise ValueError("tokenizer.json merges must be string pairs")
    vocab = {str(s): int(i) for s, i in doc["vocab"].items()}
    fallback = _check_vocab(vocab)
    if bool(doc.get("byte_fallback")) != fallback:
        raise ValueError(
            "tokenizer.json byte_fallback flag disagrees with the "
            "vocab's byte block — the artifact was edited"
        )
    return merges, vocab


def bpe_decode_ids(token_ids, vocab: dict[str, int]) -> str:
    """Host-side inverse of `bpe_encode_ids` for one sequence: ids →
    token strings → whitespace-normalized text (words are delimited by
    the end-of-word sentinel each word's final token carries; they
    rejoin with single spaces — BPE encoding normalizes whitespace by
    construction, so the round trip returns ``' '.join(words)`` of the
    original, asserted in tests). Raises on an id outside the vocab
    and on UNK (an unk holds no recoverable text). Caveat: raw text
    that itself contains the literal sentinel string decodes with
    extra word breaks — the standard BPE sentinel ambiguity.

    Under a byte-fallback vocab, ids 1..256 reassemble into bytes and
    UTF-8-decode at the fallback-run boundaries — the encoder
    decomposes whole symbols (sentinel included), so every run it
    emits is valid UTF-8 and the round trip is exact on ANY input;
    decode never raises on encoder output (UNK is never emitted, and
    a hand-crafted invalid byte run decodes with U+FFFD replacement
    rather than raising — corrupt ids outside the vocab still do)."""
    fallback = _vocab_byte_fallback(vocab)
    inv = {i: s for s, i in vocab.items()}
    syms: list[str] = []
    buf = bytearray()

    def flush():
        if buf:
            syms.append(buf.decode("utf-8", errors="replace"))
            buf.clear()

    for i in token_ids:
        if fallback and _BYTE_ID_BASE <= i < _BYTE_ID_BASE + 256:
            buf.append(i - _BYTE_ID_BASE)
            continue
        flush()
        s = inv.get(i)
        if s is None or s == UNK:
            raise ValueError(
                f"token id {i} is not decodable "
                f"({'unk' if s == UNK else 'outside the vocab'})"
            )
        syms.append(s)
    flush()
    words = "".join(syms).split(EOW)
    if words and words[-1] == "":
        words.pop()
    return " ".join(words)
