"""Similarity search over the ``embeddings`` table
(``embedding: list<float>``, 64-dim).

- ``ann_bruteforce_topk`` — exact cosine top-k: the query matrix is
  broadcast ONCE via ``ray.put``; every batch does one float64 matmul
  and emits only its local top-k per query; a tiny ``groupby(qid)``
  merges local winners.  Per-batch work is O(B·Q·d); nothing
  materializes the full score matrix.
- ``ann_ivf_topk`` — the scale path: a deterministic k-means coarse
  quantizer (trained on a driver-side sample) buckets vectors; each
  query probes only its ``NPROBE`` nearest centroids' buckets.
- ``dedup_embedding_cosine`` — EXACT near-dup pairs with cosine ≥ τ,
  computed as a tiled block-pair self-join: the dataset's blocks stay
  in the object store; one Ray task per block pair (i ≤ j) scores a
  bounded tile×tile matmul.  Exact all-pairs is inherently O(n²)
  compute, but no worker ever holds more than two tiles and the
  driver holds none — raw Ray tasks here because the Dataset API
  cannot express a block-level self-join (SURVEY.md custom-operator
  rule (c)).
- ``dedup_embedding_cosine_bucketed`` — the 100 TB path: multi-probe
  coarse-centroid bucketing (same quantizer as IVF) + in-bucket exact
  scoring via one groupby.  Approximate (a pair is found iff the two
  vectors share a probed bucket) → rows-only oracle; recall is pinned
  against the exact twin in tests.

Float discipline: all similarity math in float64, matching DuckDB's
``list_cosine_similarity`` for the oracle comparison; thresholds are
calibrated away from any pair (min observed gap ≈ 7e-3 at τ=0.5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.lookup import deref as _deref

TOPK = 5
N_QUERIES = 10  # queries = vectors with vec_id < N_QUERIES
COSINE_TAU = 0.5
NLIST = 16  # coarse centroids
NPROBE = 4
_KMEANS_SAMPLE = 512
_KMEANS_ITERS = 10
DEDUP_NPROBE = 4  # multi-probe buckets per vector in the bucketed dedup

_PAIR_SCHEMA = pa.schema([pa.field("vec_id_a", pa.int64()), pa.field("vec_id_b", pa.int64())])


def _read_emb(sf_dir: str, max_vec_id: int | None = None):
    import pyarrow.compute as pcp
    import ray.data

    flt = None if max_vec_id is None else (pcp.field("vec_id") < max_vec_id)
    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"], filter=flt
    )


def _matrix(col) -> np.ndarray:
    """(n, d) float64 from an Arrow list<float> column, via the flat
    values buffer (no per-row conversion)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off = np.asarray(col.offsets, dtype=np.int64)
    flat = np.asarray(col.values, dtype=np.float64)
    d = int(off[1] - off[0]) if len(off) > 1 else 0
    return flat[off[0] : off[-1]].reshape(len(col), d)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def _queries_ref(sf_dir: str):
    """Driver-side load of the (tiny) query set; broadcast once."""
    import ray

    q = _read_emb(sf_dir, max_vec_id=N_QUERIES).to_pandas().sort_values("vec_id")
    qm = _normalize(np.stack([np.asarray(v, np.float64) for v in q["embedding"]]))
    return ray.put({"qids": q["vec_id"].to_numpy(np.int64), "Q": qm})


def _rows_topk(S: np.ndarray, ids: np.ndarray, k: int):
    """Tie-safe local top-k per row of the (Q, B) score matrix.

    ``argpartition`` alone may drop one of two candidates tied exactly
    at the k boundary, and WHICH one it drops is batch-order dependent
    — the dropped one never reaches the global merge, so the final
    (sim DESC, nid ASC) order could lose its deterministic winner.
    Include all boundary ties, then lexsort on (-sim, nid) and
    truncate: the survivors are exactly the global tie-break's picks.
    Returns (row_ix, col_ix) flat index arrays.
    """
    nq, nb = S.shape
    k = min(k, nb)
    rows_out, cols_out = [], []
    for r in range(nq):  # Q is small (N_QUERIES); per-row cost is O(B)
        srow = S[r]
        part = np.argpartition(-srow, k - 1)[:k]
        kth = srow[part].min()
        cand = np.nonzero(srow >= kth)[0]  # boundary ties included
        order = np.lexsort((ids[cand], -srow[cand]))
        pick = cand[order[:k]]
        rows_out.append(np.full(len(pick), r, dtype=np.int64))
        cols_out.append(pick)
    return np.concatenate(rows_out), np.concatenate(cols_out)


def _local_topk(b: pa.Table, *, ref, k: int) -> pa.Table:
    """Per-batch exact scorer: emits each query's local top-k
    (stateless task; broadcast queries read zero-copy from plasma)."""
    d = _deref(ref)
    qids, Q = d["qids"], d["Q"]
    ids = np.asarray(b.column("vec_id"), dtype=np.int64)
    M = _normalize(_matrix(b.column("embedding")))
    S = Q @ M.T  # (Q, B)
    S[ids[None, :] == qids[:, None]] = -np.inf  # exclude self
    rows, cols = _rows_topk(S, ids, k)
    keep = np.isfinite(S[rows, cols])
    rows, cols = rows[keep], cols[keep]
    return pa.table(
        {
            "qid": pa.array(qids[rows]),
            "nid": pa.array(ids[cols]),
            "sim": pa.array(S[rows, cols]),
        }
    )


def _merge_topk(g: pd.DataFrame) -> pd.DataFrame:
    g = g[np.isfinite(g["sim"])]
    g = g.sort_values(["sim", "nid"], ascending=[False, True], kind="stable").head(TOPK)
    g = g.reset_index(drop=True)
    return pd.DataFrame(
        {
            "qid": g["qid"],
            "nid": g["nid"],
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
        }
    )


def ann_bruteforce_topk(sf_dir: str):
    """Exact cosine top-k for the broadcast query set; output
    (qid, nid, rank) — deterministic tie-break (sim desc, nid asc)."""
    ref = _queries_ref(sf_dir)
    return (
        _read_emb(sf_dir)
        .map_batches(
            _local_topk, fn_kwargs={"ref": ref, "k": TOPK}, batch_format="pyarrow"
        )
        .groupby("qid")
        .map_groups(_merge_topk, batch_format="pandas")
    )


def _train_centroids(sf_dir: str) -> np.ndarray:
    """Deterministic Lloyd's k-means on a fixed driver-side sample
    (first _KMEANS_SAMPLE vec_ids), spherical (cosine) variant."""
    sample = _read_emb(sf_dir, max_vec_id=_KMEANS_SAMPLE).to_pandas().sort_values("vec_id")
    X = _normalize(np.stack([np.asarray(v, np.float64) for v in sample["embedding"]]))
    k = min(NLIST, len(X))
    C = X[:k].copy()  # deterministic init: first k sample vectors
    for _ in range(_KMEANS_ITERS):
        assign = (X @ C.T).argmax(axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C = _normalize(C)
    return C


def _ivf_topk(b: pa.Table, *, ref, k: int) -> pa.Table:
    """IVF probe (stateless task): score only vectors whose coarse
    bucket is among the query's NPROBE nearest centroids."""
    d = _deref(ref)
    qids, Q, C, probes = d["qids"], d["Q"], d["C"], d["probes"]
    ids = np.asarray(b.column("vec_id"), dtype=np.int64)
    M = _normalize(_matrix(b.column("embedding")))
    bucket = (M @ C.T).argmax(axis=1)  # (B,)
    S = Q @ M.T  # (Q, B)
    probed = np.zeros_like(S, dtype=bool)
    for p in range(probes.shape[1]):
        probed |= bucket[None, :] == probes[:, p][:, None]
    S = np.where(probed, S, -np.inf)
    S[ids[None, :] == qids[:, None]] = -np.inf
    rows, cols = _rows_topk(S, ids, k)
    keep = np.isfinite(S[rows, cols])
    rows, cols = rows[keep], cols[keep]
    return pa.table(
        {
            "qid": pa.array(qids[rows]),
            "nid": pa.array(ids[cols]),
            "sim": pa.array(S[rows, cols]),
        }
    )


def ann_ivf_topk(sf_dir: str):
    """IVF top-k: approximate → rows-only oracle (recall vs the
    brute-force twin is pinned in tests)."""
    import ray

    C = _train_centroids(sf_dir)
    q_ref = _queries_ref(sf_dir)
    q = ray.get(q_ref)
    probes = np.argsort(-(q["Q"] @ C.T), axis=1, kind="stable")[:, :NPROBE]
    ref = ray.put({"qids": q["qids"], "Q": q["Q"], "C": C, "probes": probes})

    return (
        _read_emb(sf_dir)
        .map_batches(
            _ivf_topk, fn_kwargs={"ref": ref, "k": TOPK}, batch_format="pyarrow"
        )
        .groupby("qid")
        .map_groups(_merge_topk, batch_format="pandas")
    )


LSH_TABLES = 12  # L hash tables
LSH_BITS = 8  # H hyperplane bits per table
_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def _lsh_planes(d: int) -> np.ndarray:
    """Deterministic random hyperplanes (L·H, d): sign-random-projection
    LSH for cosine (Charikar's SimHash for vectors) — collision
    probability per bit is 1 − θ/π."""
    rng = np.random.Generator(np.random.PCG64(7))
    return rng.standard_normal((LSH_TABLES * LSH_BITS, d))


def _lsh_sigs(M: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, L) uint16 per-table signatures: H sign bits packed."""
    bits = (M @ planes.T) > 0  # (n, L·H)
    weights = (1 << np.arange(LSH_BITS, dtype=np.uint16))[None, None, :]
    return (bits.reshape(len(M), LSH_TABLES, LSH_BITS) * weights).sum(axis=2).astype(np.uint16)


def _lsh_topk(b: pa.Table, *, ref, k: int) -> pa.Table:
    """LSH probe (stateless task): score only vectors that collide
    with the query in ≥1 table at Hamming ≤ 1 (multi-probe: one
    flipped bit extends recall without extra tables)."""
    d = _deref(ref)
    qids, Q, planes, qsig = d["qids"], d["Q"], d["planes"], d["qsig"]
    ids = np.asarray(b.column("vec_id"), dtype=np.int64)
    M = _normalize(_matrix(b.column("embedding")))
    bsig = _lsh_sigs(M, planes)  # (B, L)
    x = np.bitwise_xor(qsig[:, None, :], bsig[None, :, :])  # (Q, B, L)
    cand = (_POPCNT8[x] <= 1).any(axis=2)  # (Q, B)
    S = np.where(cand, Q @ M.T, -np.inf)
    S[ids[None, :] == qids[:, None]] = -np.inf
    rows, cols = _rows_topk(S, ids, k)
    keep = np.isfinite(S[rows, cols])
    rows, cols = rows[keep], cols[keep]
    return pa.table(
        {
            "qid": pa.array(qids[rows]),
            "nid": pa.array(ids[cols]),
            "sim": pa.array(S[rows, cols]),
        }
    )


def ann_lsh_topk(sf_dir: str):
    """LSH-bucketed ANN top-k — the hyperplane-hash sibling of the IVF
    path (the brief's "IVF or LSH-bucketed variant"; both ship).  The
    planes and query signatures broadcast once; each batch computes
    its own signatures (O(B·L·H·d) matmul), scores only colliding
    candidates, and emits local winners into the tiny per-query merge.
    Approximate → rows-only oracle; recall vs the brute-force twin is
    pinned in tests."""
    import ray

    q_ref = _queries_ref(sf_dir)
    q = ray.get(q_ref)
    planes = _lsh_planes(q["Q"].shape[1])
    ref = ray.put(
        {"qids": q["qids"], "Q": q["Q"], "planes": planes, "qsig": _lsh_sigs(q["Q"], planes)}
    )
    return (
        _read_emb(sf_dir)
        .map_batches(
            _lsh_topk, fn_kwargs={"ref": ref, "k": TOPK}, batch_format="pyarrow"
        )
        .groupby("qid")
        .map_groups(_merge_topk, batch_format="pandas")
    )


# --------------------------------------------------------------------
# near-dup pairs
# --------------------------------------------------------------------


def _score_tile_pair(ta: pa.Table, tb: pa.Table, same: bool) -> pa.Table:
    """Exact cosine pairs ≥ τ between two tiles, global vec_id_a <
    vec_id_b (each unordered cross pair is emitted exactly once)."""
    if len(ta) == 0 or len(tb) == 0:  # readers may emit empty blocks
        return _PAIR_SCHEMA.empty_table()
    aids = np.asarray(ta.column("vec_id"), dtype=np.int64)
    bids = np.asarray(tb.column("vec_id"), dtype=np.int64)
    A = _normalize(_matrix(ta.column("embedding")))
    B = A if same else _normalize(_matrix(tb.column("embedding")))
    S = A @ B.T
    mask = (S >= COSINE_TAU) & (aids[:, None] < bids[None, :])
    a_ix, b_ix = np.nonzero(mask)
    lo = np.minimum(aids[a_ix], bids[b_ix])  # already a<b by mask; kept explicit
    hi = np.maximum(aids[a_ix], bids[b_ix])
    return pa.table({"vec_id_a": pa.array(lo), "vec_id_b": pa.array(hi)}).cast(_PAIR_SCHEMA)


def dedup_embedding_cosine(sf_dir: str):
    """EXACT near-dup pairs with cosine ≥ τ (vec_id_a < vec_id_b) as a
    tiled block-pair self-join.

    Scale shape: ``to_arrow_refs`` leaves every tile in the object
    store (nothing is pulled to the driver); T·(T+1)/2 Ray tasks each
    score one tile×tile matmul, so per-task memory is two tiles and
    the n² compute — unavoidable for an exact result — spreads across
    the cluster.  Replaces the round-1 full-matrix broadcast (VERDICT
    finding 5).  At 100 TB use ``dedup_embedding_cosine_bucketed``.
    """
    import ray
    import ray.data

    refs = _read_emb(sf_dir).to_arrow_refs()

    @ray.remote
    def score(ra, rb, same: bool) -> pa.Table:
        return _score_tile_pair(ra, rb, same)

    out_refs = []
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            # mask at global id order handles cross pairs once; i==j
            # tiles self-score with the same a<b mask
            out_refs.append(score.remote(refs[i], refs[j], i == j))
    if not out_refs:
        return ray.data.from_arrow(_PAIR_SCHEMA.empty_table())
    return ray.data.from_arrow_refs(out_refs)


def _bucket_explode(b: pa.Table, *, cref, nprobe: int) -> pa.Table:
    """Assign each vector to its ``nprobe`` nearest coarse centroids
    (multi-probe: a pair is co-bucketed iff the probe sets overlap)."""
    C = _deref(cref)
    ids = np.asarray(b.column("vec_id"), dtype=np.int64)
    M = _normalize(_matrix(b.column("embedding")))
    order = np.argsort(-(M @ C.T), axis=1, kind="stable")[:, :nprobe]  # (B, P)
    n, p = order.shape
    rep = np.repeat(np.arange(n, dtype=np.int64), p)
    out = b.take(pa.array(rep))
    return out.append_column("bucket", pa.array(order.ravel().astype(np.int32)))


def _bucket_pairs(g: pa.Table) -> pa.Table:
    """Exact all-pairs scoring inside one bucket group (duplicate
    (a, b) across shared buckets are deduped by the outer groupby)."""
    if len(g) < 2:
        return _PAIR_SCHEMA.empty_table()
    g = g.sort_by("vec_id")
    ids = np.asarray(g.column("vec_id"), dtype=np.int64)
    keep = np.ones(len(ids), dtype=bool)
    keep[1:] = ids[1:] != ids[:-1]
    if not keep.all():
        g = g.filter(pa.array(keep))
        ids = ids[keep]
    if len(g) < 2:
        return _PAIR_SCHEMA.empty_table()
    M = _normalize(_matrix(g.column("embedding")))
    S = M @ M.T
    ia, ib = np.triu_indices(len(ids), 1)
    m = S[ia, ib] >= COSINE_TAU
    return pa.table(
        {"vec_id_a": pa.array(ids[ia[m]]), "vec_id_b": pa.array(ids[ib[m]])}
    ).cast(_PAIR_SCHEMA)


def dedup_embedding_cosine_bucketed(sf_dir: str):
    """Approximate near-dup pairs: multi-probe coarse-centroid buckets
    (the IVF quantizer) + in-bucket exact scoring.  ONE groupby on the
    bucket id — the same shape as MinHash-LSH banding — so no worker
    ever sees the whole matrix and no all-pairs matmul happens.  A
    pair is found iff the two vectors share one of their DEDUP_NPROBE
    probed buckets → rows-only oracle; tests pin recall against the
    exact ``dedup_embedding_cosine`` twin."""
    import ray
    from ray.data.aggregate import Count

    C = _train_centroids(sf_dir)
    cref = ray.put(C)
    pairs = (
        _read_emb(sf_dir)
        .map_batches(
            _bucket_explode,
            fn_kwargs={"cref": cref, "nprobe": DEDUP_NPROBE},
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .map_groups(_bucket_pairs, batch_format="pyarrow")
    )
    # dedup pairs found in more than one shared bucket
    return (
        pairs.groupby(["vec_id_a", "vec_id_b"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )


KMEANS_K = 8  # clusters for the full-corpus k-means
KMEANS_ROUNDS = 5  # fixed Lloyd rounds (deterministic, resumable)


def kmeans_embeddings(sf_dir: str):
    """Distributed Lloyd's k-means over the FULL embeddings table —
    the clustering operator itself (contrast ``_train_centroids``,
    which trains IVF's quantizer on a driver-side SAMPLE).

    Scale shape: each round is ONE streaming pass; every batch assigns
    its vectors to the nearest centroid (Euclidean, via the
    ‖x‖²−2x·c+‖c‖² expansion — one matmul) and emits exactly k partial
    (cluster, Σvec, n) rows, so the combine sees k·blocks tiny rows
    and the driver only ever holds the k×d centroid state, which is
    re-broadcast with ``ray.put`` each round.  Empty clusters keep
    their previous centroid.  Output is the per-cluster (size,
    inertia) summary — small and stable.  Iterative → no SQL twin;
    pinned in tests against a sequential numpy reference at sf0.001.
    """
    import ray
    from ray.data.aggregate import Sum

    init = _read_emb(sf_dir, max_vec_id=KMEANS_K).to_pandas().sort_values("vec_id")
    C = np.stack([np.asarray(v, np.float64) for v in init["embedding"]])
    k, dim = C.shape
    ds = _read_emb(sf_dir)

    def partials(b: pa.Table, *, ref) -> pa.Table:
        C = _deref(ref)
        M = _matrix(b.column("embedding"))
        d2 = (M * M).sum(1)[:, None] - 2.0 * (M @ C.T) + (C * C).sum(1)[None, :]
        assign = d2.argmin(axis=1)
        sums = np.zeros_like(C)
        for j in range(len(C)):  # k is small; the matmul dominates
            sums[j] = M[assign == j].sum(axis=0)
        counts = np.bincount(assign, minlength=len(C)).astype(np.int64)
        return pa.table(
            {
                "cluster": pa.array(np.arange(len(C), dtype=np.int64)),
                "vsum": pa.array(list(sums)),
                "n": pa.array(counts),
            }
        )

    for _ in range(KMEANS_ROUNDS):
        ref = ray.put(C)
        part = (
            ds.map_batches(partials, fn_kwargs={"ref": ref}, batch_format="pyarrow")
            .to_pandas()  # k rows per block — tiny
        )
        newC = C.copy()
        for j, grp in part.groupby("cluster"):
            n = int(grp["n"].sum())
            if n > 0:
                newC[int(j)] = (
                    np.add.reduce(np.stack([np.asarray(v, np.float64) for v in grp["vsum"]]))
                    / n
                )
        C = newC

    def stats(b: pa.Table, *, ref) -> pa.Table:
        C = _deref(ref)
        M = _matrix(b.column("embedding"))
        d2 = (M * M).sum(1)[:, None] - 2.0 * (M @ C.T) + (C * C).sum(1)[None, :]
        assign = d2.argmin(axis=1)
        best = d2[np.arange(len(M)), assign]
        counts = np.bincount(assign, minlength=len(C)).astype(np.int64)
        inertia = np.zeros(len(C))
        np.add.at(inertia, assign, best)
        return pa.table(
            {
                "cluster": pa.array(np.arange(len(C), dtype=np.int64)),
                "n": pa.array(counts),
                "inertia": pa.array(inertia),
            }
        )

    ref = ray.put(C)
    out = (
        ds.map_batches(stats, fn_kwargs={"ref": ref}, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Sum("n", alias_name="n"), Sum("inertia", alias_name="inertia"))
        .to_pandas()
        .sort_values("cluster")
        .reset_index(drop=True)
    )
    return out


EMB_DIM = 64  # embeddings.parquet vector width (TESTDATA.md)


def embedding_label_centroids(sf_dir: str):
    """Per-label centroid of the embedding column, LONG format
    (label, dim, mean_val) so DuckDB can oracle-check it via unnest.

    Scale shape: each batch collapses to (labels-present × d) partial
    sums with ONE np.add.at scatter (no per-row loop), so the shuffle
    moves ≤ |labels|·d tiny rows per block into a native Sum groupby;
    label cardinality is bounded (a class/topic id), making the final
    table ≤ |labels|·d rows.  The mean division happens driver-side
    on that reduced table."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def partial(b: pa.Table) -> pa.Table:
        M = _matrix(b.column("embedding"))
        lab = np.asarray(b.column("label"), dtype=np.int64)
        ulab, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(ulab), M.shape[1]))
        np.add.at(sums, inv, M)
        cnt = np.bincount(inv).astype(np.int64)
        k, d = sums.shape
        return pa.table(
            {
                "label": pa.array(np.repeat(ulab, d)),
                "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), k)),
                "s": pa.array(sums.ravel()),
                "n": pa.array(np.repeat(cnt, d)),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["mean_val"] = out["s"] / out["n"]
    out["label"] = out["label"].astype(np.int64)
    return out[["label", "dim", "mean_val"]]


def embedding_gram_matrix(sf_dir: str):
    """Distributed Gram matrix XᵀX over the embedding column — the
    one-pass mergeable partial behind covariance / PCA / whitening at
    corpus scale: every batch collapses B rows to ONE d×d float64
    matmul (flattened to its d(d+1)/2 upper triangle), so the exchange
    moves O(d²) rows per block regardless of corpus size.

    Final combine is the shared coarse-bucket sum ([queries.py]
    `_sum_by_keys_bucketed` on the row index); the driver only ever
    sees the d(d+1)/2-row result.  Float64 products of exactly-
    representable float32 inputs; sum order differs from the oracle's
    only at ~1e-13 relative."""
    from .queries import _sum_by_keys_bucketed

    ds = _read_emb(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        m = _matrix(b.column("embedding"))
        g = m.T @ m
        iu, ju = np.triu_indices(g.shape[0])
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64)),
                "j": pa.array(ju.astype(np.int64)),
                "g": pa.array(g[iu, ju]),
            }
        )

    return _sum_by_keys_bucketed(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["i", "j"],
        sum_cols=["g"],
        out_names=["g"],
    )


PCA_TOPK = 8


def embedding_pca_topk(sf_dir: str):
    """Distributed PCA — the covariance eigenspectrum of the embedding
    corpus from ONE streaming pass: per batch a d×d Gram partial, a
    d-vector column-sum partial and a row count ride the SAME flattened
    (i, j, g) exchange (sums as j = -1 rows, the count as (-1, -1)),
    so covariance needs no second read.  The driver reconstructs
    C = (G − n·μμᵀ)/(n−1) from the O(d²) reduced rows and runs the
    d×d eigendecomposition locally (d = 64 — trivially driver-sized
    even when the corpus is 10^10 rows).

    Eigen-decomposition is not SQL-expressible → rows-only driver
    check; the spectrum is pinned against a direct in-memory numpy
    PCA in tests/test_session_funnel_edges.py."""
    from .queries import _sum_by_keys_bucketed

    ds = _read_emb(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        m = _matrix(b.column("embedding"))
        g = m.T @ m
        iu, ju = np.triu_indices(g.shape[0])
        d = g.shape[0]
        i = np.r_[iu, np.arange(d), [-1]].astype(np.int64)
        j = np.r_[ju, np.full(d, -1), [-1]].astype(np.int64)
        v = np.r_[g[iu, ju], m.sum(axis=0), [float(len(m))]]
        return pa.table({"i": pa.array(i), "j": pa.array(j), "g": pa.array(v)})

    flat = _sum_by_keys_bucketed(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["i", "j"],
        sum_cols=["g"],
        out_names=["g"],
    ).to_pandas()

    n = float(flat.loc[(flat["i"] == -1) & (flat["j"] == -1), "g"].iloc[0])
    sums = flat[(flat["j"] == -1) & (flat["i"] >= 0)].sort_values("i")["g"].to_numpy()
    d = len(sums)
    gram = np.zeros((d, d))
    up = flat[flat["j"] >= 0]
    gram[up["i"].to_numpy(), up["j"].to_numpy()] = up["g"].to_numpy()
    gram = gram + np.triu(gram, 1).T
    mu = sums / n
    cov = (gram - n * np.outer(mu, mu)) / (n - 1.0)
    evals = np.linalg.eigvalsh(cov)[::-1]
    total = float(evals.sum())
    top = evals[:PCA_TOPK]
    return pd.DataFrame(
        {
            "component": np.arange(1, len(top) + 1, dtype=np.int64),
            "eigenvalue": top,
            "explained_ratio": top / total,
        }
    )


_INT8_RESCORE_CAND = 4 * TOPK  # int8-stage candidates per (query, batch)


def _local_int8_rescore(b: pa.Table, *, ref, k: int) -> pa.Table:
    """Two-stage per-batch scorer — the production ANN serving shape:

    1. **int8 stage**: both sides symmetric per-vector quantized; all
       candidates scored with an INTEGER dot product (int32 matmul —
       on real hardware the VNNI/DP4A path at 4× the float32
       throughput and ¼ the memory traffic);
    2. **rescore stage**: only the int8-stage top-``_INT8_RESCORE_CAND``
       per query are re-scored in exact float64; the exact scores are
       what the global merge ranks.

    Approximate only through stage-1 candidate selection (the exact
    top-k member must survive the 4k-wide int8 cut to be found) —
    recall vs the exact twin is pinned in pytest."""
    d = _deref(ref)
    qids, Q = d["qids"], d["Q"]
    ids = np.asarray(b.column("vec_id"), dtype=np.int64)
    M = _normalize(_matrix(b.column("embedding")))

    def q8(X: np.ndarray):
        m = np.abs(X).max(axis=1)
        safe = np.where(m > 0, m, 1.0)
        codes = np.floor(X * 127.0 / safe[:, None] + 0.5).astype(np.int32)
        return codes, safe / 127.0

    Qc, _ = q8(Q)
    Mc, _ = q8(M)
    S8 = Qc @ Mc.T  # integer scores (scales are per-vector positive
    # factors — they rescale rows/cols monotonically enough for
    # CANDIDATE SELECTION; ranking truth comes from the rescore)
    S8 = S8.astype(np.float64)
    S8[ids[None, :] == qids[:, None]] = -np.inf
    rows, cols = _rows_topk(S8, ids, min(_INT8_RESCORE_CAND, len(ids)))
    keep = np.isfinite(S8[rows, cols])
    rows, cols = rows[keep], cols[keep]
    exact = np.einsum("ij,ij->i", Q[rows], M[cols])  # rescore only survivors
    out = pa.table(
        {
            "qid": pa.array(qids[rows]),
            "nid": pa.array(ids[cols]),
            "sim": pa.array(exact),
        }
    )
    return out


def ann_int8_rescore_topk(sf_dir: str):
    """Two-stage ANN: int8 integer-dot-product candidate generation +
    exact float rescoring of the survivors (``_local_int8_rescore``),
    merged to a global (sim desc, nid asc) top-k per query.  The
    memory-bandwidth shape that serves ANN at 100 TB: the full corpus
    streams as int8 codes (4× less traffic), floats are touched only
    for ~4k candidates per query per batch.  Approximate-by-design →
    rows-only oracle; recall pinned vs ``ann_bruteforce_topk``."""
    ref = _queries_ref(sf_dir)
    return (
        _read_emb(sf_dir)
        .map_batches(
            _local_int8_rescore,
            fn_kwargs={"ref": ref, "k": TOPK},
            batch_format="pyarrow",
        )
        .groupby("qid")
        .map_groups(_merge_topk, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Embedding quantization (int8 ANN storage compression)
# ---------------------------------------------------------------------------


def embedding_quantize_int8(sf_dir: str):
    """Symmetric per-vector int8 quantization — the standard 4× memory
    reduction for ANN index storage at corpus scale: per vector,
    ``scale = max|v| / 127`` and ``code_j = floor(v_j·127/max|v| + ½)``
    (half-up — deterministic and identical in SQL, unlike
    banker's-rounding ``round``).  Emits per-vector audit stats
    rather than the raw codes so the oracle is numeric: the code sum,
    max |code| (≤ 127 by construction) and the L2 reconstruction
    error vs ``code·scale``.  Shuffle-free: one vectorized kernel per
    batch over the flat values buffer; at 100 TB this is the
    compression pass that runs before an IVF build ships codes
    instead of floats."""
    import ray.data

    def quant(b: pa.Table) -> pa.Table:
        M = _matrix(b.column("embedding"))
        m = np.abs(M).max(axis=1)
        safe = np.where(m > 0, m, 1.0)
        codes = np.floor(M * 127.0 / safe[:, None] + 0.5)
        codes[m == 0] = 0.0
        recon = codes * (safe[:, None] / 127.0)
        err = ((M - recon) ** 2).sum(axis=1)
        err[m == 0] = 0.0
        return pa.table(
            {
                "vec_id": b.column("vec_id"),
                "max_abs": pa.array(m),
                "code_sum": pa.array(codes.sum(axis=1).astype(np.int64)),
                "max_code": pa.array(np.abs(codes).max(axis=1).astype(np.int64)),
                "l2_err": pa.array(err),
            }
        )

    return _read_emb(sf_dir).map_batches(quant, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Contrastive hard-negative mining
# ---------------------------------------------------------------------------

_HN_QUERY_MOD = 25   # query stride over vec_id
_HN_MAX_QUERIES = 512  # HARD cap on the query set (like N_QUERIES):
# queries = vec_id % 25 == 0 AND vec_id < 25·512.  Without the cap the
# query set grows ∝ n/25, making the broadcast matrix O(n·d) and total
# matmul work O(n²/25) — quadratic at 100-TB scale.  Capped, the
# broadcast is ≤ 512×d and every batch's scoring is O(B·512·d): linear.
_HN_BUCKETS = 32     # coarse finalizer fan-out (power of 2, ≤ queries)

_HN_CAND_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("qid", pa.int64()),
        ("nid", pa.int64()),
        ("sim", pa.float64()),
    ]
)


def _hn_select_queries(b: pa.Table) -> pa.Table:
    ids = np.asarray(b.column("vec_id"), dtype=np.int64)
    return b.filter(
        pa.array((ids % _HN_QUERY_MOD == 0) & (ids < _HN_QUERY_MOD * _HN_MAX_QUERIES))
    )


def _hn_queries_ref(sf_dir: str):
    """Broadcast query set for hard-negative mining: embeddings AND
    labels (the exclusion is same-label, not same-id).  The mod+cap
    filter runs distributed (pyarrow dataset expressions lack %); only
    the ≤ ``_HN_MAX_QUERIES`` query slice reaches the driver.  Returns
    a ``ray.put`` handle (``None`` payload when no vector qualifies —
    the scorer then emits nothing, matching the empty oracle)."""
    import ray
    import ray.data

    q = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding", "label"],
        )
        .map_batches(_hn_select_queries, batch_format="pyarrow")
        .to_pandas()
    )
    if not len(q):  # no qualifying vector (guard BEFORE sort_values —
        return ray.put(None)  # an empty Dataset's frame may drop columns)
    q = q.sort_values("vec_id")
    qm = _normalize(np.stack([np.asarray(v, np.float64) for v in q["embedding"]]))
    return ray.put(
        {
            "qids": q["vec_id"].to_numpy(np.int64),
            "qlabels": q["label"].to_numpy(np.int64),
            "Q": qm,
        }
    )


def _hn_local_best(b: pa.Table, *, ref) -> pa.Table:
    """Per-batch exact scorer: each query's best DIFFERENT-LABEL
    candidate in this batch (sim desc, nid asc tie-break) — ≤1 row per
    (query, batch) reaches the merge, pre-tagged with its coarse
    finalizer bucket."""
    d = _deref(ref)
    if d is None or len(b) == 0:
        return _HN_CAND_SCHEMA.empty_table()
    qids, qlabels, Q = d["qids"], d["qlabels"], d["Q"]
    ids = np.asarray(b.column("vec_id"), dtype=np.int64)
    labels = np.asarray(b.column("label"), dtype=np.int64)
    M = _normalize(_matrix(b.column("embedding")))
    S = Q @ M.T  # (Q, B) — Q bounded by _HN_MAX_QUERIES
    S[qlabels[:, None] == labels[None, :]] = -np.inf  # same label excluded
    rows, cols = _rows_topk(S, ids, 1)
    keep = np.isfinite(S[rows, cols])
    rows, cols = rows[keep], cols[keep]
    qw = qids[rows]
    return pa.table(
        {
            "bucket": pa.array(((qw // _HN_QUERY_MOD) & (_HN_BUCKETS - 1)).astype(np.int32)),
            "qid": pa.array(qw),
            "nid": pa.array(ids[cols]),
            "sim": pa.array(S[rows, cols]),
        }
    )


def _hn_merge_bucket(g: pa.Table) -> pa.Table:
    """Vectorized keep-best over a COARSE bucket of queries (the
    `cdc_latest_event_per_user` finalizer shape): one lexsort + one
    run-boundary mask per bucket — ≤ ``_HN_BUCKETS`` finalizer groups
    total, never one Python call per query."""
    qid = np.asarray(g.column("qid"), dtype=np.int64)
    nid = np.asarray(g.column("nid"), dtype=np.int64)
    sim = np.asarray(g.column("sim"), dtype=np.float64)
    fin = np.isfinite(sim)
    qid, nid, sim = qid[fin], nid[fin], sim[fin]
    if len(qid) == 0:
        return pa.schema([("qid", pa.int64()), ("nid", pa.int64())]).empty_table()
    order = np.lexsort((nid, -sim, qid))  # qid asc, sim desc, nid asc
    qs = qid[order]
    first = np.r_[True, qs[1:] != qs[:-1]]
    win = order[first]
    return pa.table({"qid": pa.array(qid[win]), "nid": pa.array(nid[win])})


def contrastive_hard_negatives(sf_dir: str):
    """Hard-negative mining for contrastive training: for each query
    vector (vec_id % 25 == 0, capped at ``_HN_MAX_QUERIES`` — a
    BOUNDED anchor sample, the same contract as the ANN ops'
    ``N_QUERIES``), the single most-cosine-similar vector with a
    DIFFERENT label — the "hardest" negative an InfoNCE/triplet batch
    builder pairs with each anchor.  Exact brute-force over the full
    corpus: the bounded (query, label) set broadcasts once
    (`ray.put`), every batch scores one (Q, B) float64 matmul and
    emits ≤1 candidate per query, and the merge is a coarse-bucket
    vectorized keep-best (≤ ``_HN_BUCKETS`` finalizer groups seeing
    O(queries × blocks) tiny rows).  Deterministic tie-break (sim
    desc, nid asc) via the shared `_rows_topk` boundary-tie-safe
    kernel."""
    import ray.data

    ref = _hn_queries_ref(sf_dir)
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    return (
        ds.map_batches(_hn_local_best, fn_kwargs={"ref": ref}, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_hn_merge_bucket, batch_format="pyarrow")
    )
