"""Vectorized text signatures for near-duplicate detection.

All kernels are numpy over flattened Arrow list buffers — no Python
per-row loops.  They generalize the reference's per-value row cleaners
(AGO.format_row, reference ago/ago.py:436-474) to corpus-scale
signature computation:

- **shingles**: hashed word n-grams (content-defined features).
- **MinHash**: ``num_perm`` universal-hash minima per doc; two docs'
  signature agreement estimates their shingle-set Jaccard.
- **SimHash**: 64-bit sign-aggregated fingerprint; near-dups have
  small Hamming distance.
- **band hashes**: LSH banding of the MinHash signature — docs
  sharing any band bucket are candidate pairs.

Determinism: token hashing is ``pandas.util.hash_array`` (fixed-key
SipHash-ish, no PYTHONHASHSEED dependence — same contract as
functions/hashing.py); permutations are fixed affine maps seeded from
a constant, so signatures are stable across processes, runs, nodes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MIX = np.uint64(0x9E3779B97F4A7C15)  # 2^64 / golden ratio


def _flat_tokens(texts: pa.ChunkedArray | pa.Array, pattern: str = " "):
    """Split each string on ``pattern`` (plain, after trim) and return
    (flat token hashes uint64, per-doc offsets int64).  Token split
    semantics match DuckDB ``string_split(trim(text), ' ')``."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    trimmed = pc.utf8_trim(texts, " ")  # space-only: matches trim(text, ' ') in the oracles (bare trim() is Zs-only in DuckDB and differs from Arrow)
    lists = pc.split_pattern(trimmed, pattern)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    offsets = np.asarray(lists.offsets, dtype=np.int64)
    flat = np.asarray(lists.values.to_pandas(), dtype=object)
    h = pd.util.hash_array(flat, categorize=False) if len(flat) else np.empty(0, np.uint64)
    return h.astype(np.uint64), offsets - offsets[0]


def shingle_hashes(texts, k: int = 2):
    """Hashed word-``k``-gram shingles.

    Returns (flat shingle hashes uint64, per-doc offsets int64).
    Short-doc rule (shared bit-exactly with every jaccard oracle SQL):
    docs with 1 ≤ tokens < ``k`` contribute their single all-token
    shingle; EMPTY docs (whitespace-only text) contribute ZERO shingles
    — they can never pair.  Without the empty rule, two blank docs
    would share the hash('') singleton and read as exact near-dups
    while the oracle's ``trim(text,' ')='' → []`` branch drops them
    (round-2 ADVICE divergence, closed both sides)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    tok, off = _flat_tokens(texts)
    n = len(off) - 1
    lens = off[1:] - off[:-1]
    # split('') yields [''] — rewrite whitespace-only docs to 0 tokens
    empty = np.asarray(
        pc.equal(pc.utf8_trim(texts, " "), pa.scalar("")).fill_null(True)
    )
    if empty.any():
        keep_tok = ~np.repeat(empty, lens)
        tok = tok[keep_tok]
        lens = np.where(empty, 0, lens)
        off = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=off[1:])
    if k <= 1:
        return tok, off
    doc_end = np.repeat(off[1:], lens)  # per-token: owning doc's end offset
    pos = np.arange(len(tok), dtype=np.int64)
    with np.errstate(over="ignore"):
        sh = tok.copy()
        for j in range(1, k):
            rolled = np.roll(tok, -j)
            mixed = sh * _MIX ^ rolled
            # don't mix tokens across the doc boundary (short docs keep
            # their partial all-token shingle)
            sh = np.where(pos + j < doc_end, mixed, sh)
    # shingle i is valid while i + k - 1 stays inside the doc
    sh_lens = np.maximum(lens - (k - 1), np.minimum(lens, 1))
    doc_start = np.repeat(off[:-1], sh_lens)
    within = _ranges(sh_lens)
    flat = sh[doc_start + within]
    new_off = np.zeros(n + 1, np.int64)
    np.cumsum(sh_lens, out=new_off[1:])
    return flat, new_off


def _ranges(lens: np.ndarray) -> np.ndarray:
    """[0..lens[0]), [0..lens[1]), ... concatenated."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    ix = np.arange(total, dtype=np.int64)
    starts = np.repeat(np.cumsum(lens) - lens, lens)
    return ix - starts


def distinct_per_doc(flat: np.ndarray, offsets: np.ndarray):
    """Sort + dedup each doc's hash run.  Returns (flat, offsets) with
    per-doc sorted distinct values."""
    n = len(offsets) - 1
    doc_ix = np.repeat(np.arange(n, dtype=np.int64), offsets[1:] - offsets[:-1])
    order = np.lexsort((flat, doc_ix))
    f, d = flat[order], doc_ix[order]
    keep = np.ones(len(f), dtype=bool)
    keep[1:] = (f[1:] != f[:-1]) | (d[1:] != d[:-1])
    f, d = f[keep], d[keep]
    counts = np.bincount(d, minlength=n)
    new_off = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=new_off[1:])
    return f, new_off


def _perm_params(num_perm: int, seed: int = 0x5EED):
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, 2**63, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    flat: np.ndarray, offsets: np.ndarray, num_perm: int = 128, seed: int = 0x5EED
) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signature matrix.

    Permutation j is the bijection ``h -> h * a_j + b_j (mod 2^64)``
    with odd ``a_j`` — a valid fixed permutation of the hash space.
    Empty docs get all-max signatures.
    """
    a, b = _perm_params(num_perm, seed)
    n = len(offsets) - 1
    out = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(flat) == 0:
        return out
    nonempty = offsets[1:] > offsets[:-1]
    starts = offsets[:-1][nonempty]
    with np.errstate(over="ignore"):
        # chunk the perm axis to bound the (n_shingles, num_perm) temp
        step = max(1, int(2**24 // max(len(flat), 1)))
        for j0 in range(0, num_perm, step):
            j1 = min(num_perm, j0 + step)
            permed = flat[:, None] * a[None, j0:j1] + b[None, j0:j1]
            out[nonempty, j0:j1] = np.minimum.reduceat(permed, starts, axis=0)[
                : nonempty.sum()
            ]
    return out


def simhash64(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """(n_docs,) int64 SimHash: per-bit ±1 vote over each doc's
    shingle hashes, sign → bit."""
    n = len(offsets) - 1
    bits = np.unpackbits(
        flat.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    ).astype(np.int32)  # (n_shingles, 64)
    votes = np.zeros((n, 64), np.int64)
    nonempty = offsets[1:] > offsets[:-1]
    if nonempty.any():
        starts = offsets[:-1][nonempty]
        sums = np.add.reduceat(bits, starts, axis=0)[: nonempty.sum()]
        lens = (offsets[1:] - offsets[:-1])[nonempty][:, None]
        votes[nonempty] = 2 * sums - lens  # (+1 per set bit, -1 per clear)
    sig_bits = (votes > 0).astype(np.uint8)
    packed = np.packbits(sig_bits, axis=1, bitorder="little")
    return packed.view(np.uint64).ravel().view(np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a.view(np.uint64) ^ b.view(np.uint64)
    return popcount64(x)


def popcount64(x: np.ndarray) -> np.ndarray:
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x).astype(np.int64)
    return (
        np.unpackbits(x.view(np.uint8).reshape(*x.shape, 8), axis=-1)
        .sum(axis=-1)
        .astype(np.int64)
    )


def band_hashes(sig: np.ndarray, num_bands: int = 16) -> np.ndarray:
    """(n_docs, num_bands) int64: one mixed hash per LSH band (the
    signature reshaped to ``num_bands`` groups of rows)."""
    n, p = sig.shape
    assert p % num_bands == 0, "num_perm must divide into bands"
    r = p // num_bands
    grouped = sig.reshape(n, num_bands, r)
    with np.errstate(over="ignore"):
        h = np.full((n, num_bands), np.uint64(0x12345678ABCDEF01))
        for j in range(r):
            h = h * _MIX ^ grouped[:, :, j]
    return h.view(np.int64)


def pairwise_jaccard_dense(
    sets_a: tuple[np.ndarray, np.ndarray], sets_b: tuple[np.ndarray, np.ndarray]
):
    """All-pairs Jaccard between two batches of hashed-shingle sets
    (flat, offsets) via a dense incidence matmul over the union vocab.

    Scale note: O(|A|·|B|·|vocab|) — this is the *verify kernel* for
    candidate groups and the small-batch exact baseline; the scale
    path to avoid the n² is LSH banding (``band_hashes``).
    """
    fa, oa = sets_a
    fb, ob = sets_b
    vocab, inv = np.unique(np.concatenate([fa, fb]), return_inverse=True)
    inv_a, inv_b = inv[: len(fa)], inv[len(fa) :]
    na, nb = len(oa) - 1, len(ob) - 1
    A = np.zeros((na, len(vocab)), np.float32)
    B = np.zeros((nb, len(vocab)), np.float32)
    A[np.repeat(np.arange(na), oa[1:] - oa[:-1]), inv_a] = 1.0
    B[np.repeat(np.arange(nb), ob[1:] - ob[:-1]), inv_b] = 1.0
    inter = A @ B.T
    sizes_a = (oa[1:] - oa[:-1]).astype(np.float64)
    sizes_b = (ob[1:] - ob[:-1]).astype(np.float64)
    union = sizes_a[:, None] + sizes_b[None, :] - inter
    return inter / np.maximum(union, 1.0)


def jaccard_e6(j: np.ndarray) -> np.ndarray:
    """Exact-decimal micro-Jaccard: floor(j*1e6 + 0.5) — identical to
    DuckDB ``CAST(floor(j * 1000000 + 0.5) AS BIGINT)``."""
    return np.floor(np.asarray(j, np.float64) * 1e6 + 0.5).astype(np.int64)
