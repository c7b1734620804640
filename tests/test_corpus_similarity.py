"""Corpus dedup / similarity operators: kernel unit tests plus
pinning the probabilistic ops (MinHash LSH, SimHash, IVF) against
their exact oracle-checked twins (all-pairs Jaccard, brute-force
top-k).  Mirrors the reference's round-trip-invariance test idea
(reference tests/test_postgres.py:69-92): approximate path vs exact
path on the same input."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.functions import textsig

SF_DIR = "/root/testdata/sf0.001"


# ------------------------- kernels (no Ray) -------------------------


def test_shingles_do_not_cross_doc_boundary():
    a = pa.array(["a b c", "a"])
    b = pa.array(["a b c", "a", "zzz qqq"])
    fa, oa = textsig.shingle_hashes(a, k=2)
    fb, ob = textsig.shingle_hashes(b, k=2)
    # doc 1 ("a") has one partial shingle, identical in both corpora
    assert list(fa[oa[1] : oa[2]]) == list(fb[ob[1] : ob[2]])


def test_shingle_count_and_determinism():
    t = pa.array(["w x y z", "w x y z", "p q"])
    flat, off = textsig.shingle_hashes(t, k=2)
    lens = (off[1:] - off[:-1]).tolist()
    assert lens == [3, 3, 1]
    assert list(flat[0:3]) == list(flat[3:6])  # identical docs → identical shingles


def test_shingles_empty_and_short_docs():
    # the ADVICE/round-2 divergence rule, pinned on BOTH extremes:
    # whitespace-only docs → ZERO shingles (can never pair, matching
    # the oracle's trim='' → [] branch); 1-token docs → their single
    # all-token shingle, equal across identical docs
    t = pa.array(["", "   ", "a", "a", "x y"])
    flat, off = textsig.shingle_hashes(t, k=2)
    lens = (off[1:] - off[:-1]).tolist()
    assert lens == [0, 0, 1, 1, 1]
    assert flat[off[2]] == flat[off[3]]  # identical 1-token docs match
    # two empty docs must NOT read as near-dups
    f, o = textsig.distinct_per_doc(flat, off)
    jac = textsig.pairwise_jaccard_dense((f, o), (f, o))
    assert jac[0, 1] == 0.0 and jac[0, 0] == 0.0
    assert jac[2, 3] == 1.0


def test_shingles_null_text_is_empty():
    t = pa.array(["a b", None, "c"])
    flat, off = textsig.shingle_hashes(t, k=2)
    assert (off[1:] - off[:-1]).tolist() == [1, 0, 1]


def test_distinct_per_doc():
    flat = np.array([5, 5, 3, 9, 9, 9], dtype=np.uint64)
    off = np.array([0, 3, 6], dtype=np.int64)
    f, o = textsig.distinct_per_doc(flat, off)
    assert o.tolist() == [0, 2, 3]
    assert f[:2].tolist() == [3, 5] and f[2] == 9


def test_minhash_estimates_jaccard():
    rng = np.random.Generator(np.random.PCG64(7))
    shared = rng.integers(0, 2**63, 80, dtype=np.uint64)
    a_only = rng.integers(0, 2**63, 20, dtype=np.uint64)
    b_only = rng.integers(0, 2**63, 20, dtype=np.uint64)
    flat = np.concatenate([shared, a_only, shared, b_only])
    off = np.array([0, 100, 200], dtype=np.int64)
    sig = textsig.minhash_signatures(flat, off, num_perm=256)
    est = (sig[0] == sig[1]).mean()
    true_j = 80 / 120
    assert abs(est - true_j) < 0.12


def test_simhash_identical_and_disjoint():
    rng = np.random.Generator(np.random.PCG64(11))
    x = rng.integers(0, 2**63, 60, dtype=np.uint64)
    y = rng.integers(0, 2**63, 60, dtype=np.uint64)
    flat = np.concatenate([x, x, y])
    off = np.array([0, 60, 120, 180], dtype=np.int64)
    s = textsig.simhash64(flat, off)
    assert textsig.hamming64(s[:1], s[1:2])[0] == 0
    assert textsig.hamming64(s[:1], s[2:3])[0] > 10


def test_pairwise_jaccard_dense_exact():
    a = (np.array([1, 2, 3], np.uint64), np.array([0, 3], np.int64))
    b = (np.array([2, 3, 4, 9], np.uint64), np.array([0, 4], np.int64))
    j = textsig.pairwise_jaccard_dense(a, b)
    assert j.shape == (1, 1)
    assert j[0, 0] == pytest.approx(2 / 5)


def test_band_hashes_shape_and_sensitivity():
    sig = np.arange(256, dtype=np.uint64).reshape(2, 128)
    bh = textsig.band_hashes(sig, num_bands=16)
    assert bh.shape == (2, 16)
    assert (bh[0] != bh[1]).all()


def test_langid_vectorized_predictions():
    """LangId (vectorized flat-token join) reproduces the stopword
    profile scoring: one profile hit per matching token, argmax over
    languages, 'und' when no profile word appears."""
    from cityofphiladelphia_databridge_etl_tools_ray.stages.text import LangId

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "the cat and the dog went to the market",  # en
                    "der Hund ist nicht ein Fisch und",  # de ("und" hits de only)
                    "le chat est sur la table et il ne bouge pas",  # fr
                    "xyzzy plugh qwerty",  # no profile word → und
                    "",  # empty → und
                ]
            ),
        }
    )
    out = LangId()(batch)
    assert out.column("lang_pred").to_pylist() == ["en", "de", "fr", "und", "und"]
    scores = out.column("lang_score").to_pylist()
    # 'the'×3 + 'and' + 'to' = 5 en hits; empty/no-match docs score 0
    assert scores[0] == 5 and scores[3] == 0 and scores[4] == 0


def test_repetition_stats_kernel():
    """Integer repetition numerators match hand counts, including the
    degenerate cases (empty string → one empty token; all-same doc →
    top_count == n_tokens)."""
    from cityofphiladelphia_databridge_etl_tools_ray.stages.text import repetition_stats

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "a b a c a b",  # 6 tokens, 3 distinct, top 'a'×3
                    "spam spam spam spam",  # all-same
                    "each word here once",  # all-distinct
                    "",  # split('') → [''] → 1 token
                ]
            ),
        }
    )
    out = repetition_stats(batch)
    assert out.column("n_tokens").to_pylist() == [6, 4, 4, 1]
    assert out.column("n_distinct").to_pylist() == [3, 1, 4, 1]
    assert out.column("top_count").to_pylist() == [3, 4, 1, 1]


# ------------------------- pipelines (Ray) -------------------------


def _pairs(df: pd.DataFrame) -> set:
    return set(zip(df["doc_id_a"].astype(int), df["doc_id_b"].astype(int)))


@pytest.fixture(scope="module")
def exact_pairs(ray_session):
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.corpus import dedup_ngram_jaccard

    return dedup_ngram_jaccard(SF_DIR).to_pandas()


def test_minhash_lsh_vs_exact(ray_session, exact_pairs):
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.corpus import dedup_minhash_lsh

    lsh = dedup_minhash_lsh(SF_DIR).to_pandas()
    exact_set, lsh_set = _pairs(exact_pairs), _pairs(lsh)
    # verified candidates: no false positives
    assert lsh_set <= exact_set
    # planted near-dups have high jaccard → banding finds nearly all
    if exact_set:
        assert len(lsh_set) / len(exact_set) >= 0.8
    # jaccard values agree exactly where both found the pair
    merged = lsh.merge(exact_pairs, on=["doc_id_a", "doc_id_b"], suffixes=("_l", "_e"))
    assert (merged["jaccard_e6_l"] == merged["jaccard_e6_e"]).all()


def test_simhash_pairs_are_real_near_dups(ray_session, exact_pairs):
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.corpus import dedup_simhash

    sh = dedup_simhash(SF_DIR).to_pandas()
    assert _pairs(sh) <= _pairs(exact_pairs)


def test_dedup_exact_counts_duplicates(ray_session, tmp_path):
    import ray.data
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.corpus import dedup_exact

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(["x y", "u v", "x y", "x y", "w"]),
        }
    )
    ray.data.from_arrow(t).write_parquet(str(tmp_path / "documents.parquet"))
    out = dedup_exact(str(tmp_path)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [0, 1, 4]
    assert out["n_copies"].tolist() == [3, 1, 1]


def test_ann_ivf_recall_vs_bruteforce(ray_session):
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.similarity import (
        ann_bruteforce_topk,
        ann_ivf_topk,
    )

    bf = ann_bruteforce_topk(SF_DIR).to_pandas()
    ivf = ann_ivf_topk(SF_DIR).to_pandas()
    bf_set = set(zip(bf["qid"], bf["nid"]))
    ivf_set = set(zip(ivf["qid"], ivf["nid"]))
    assert len(bf_set) == len(set(bf["qid"])) * 5
    # deterministic pipeline → stable recall; probed 4/16 buckets
    assert len(bf_set & ivf_set) / len(bf_set) >= 0.5


def test_embedding_cosine_finds_planted_pairs(ray_session, tmp_path):
    import ray.data
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.similarity import (
        dedup_embedding_cosine,
    )

    rng = np.random.Generator(np.random.PCG64(3))
    M = rng.normal(size=(40, 16))
    M[7] = M[3] + rng.normal(scale=0.01, size=16)  # planted near-dup
    M[25] = M[25 - 1] * 2.0  # planted exact direction dup (scaled)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(40, dtype=np.int64)),
            "embedding": pa.array([v.astype(np.float32) for v in M], pa.list_(pa.float32())),
        }
    )
    ray.data.from_arrow(t).write_parquet(str(tmp_path / "embeddings.parquet"))
    out = dedup_embedding_cosine(str(tmp_path)).to_pandas()
    pairs = set(zip(out["vec_id_a"], out["vec_id_b"]))
    assert (3, 7) in pairs and (24, 25) in pairs
    assert (out["vec_id_a"] < out["vec_id_b"]).all()


def test_embedding_cosine_bucketed_vs_exact(ray_session):
    """The multi-probe bucketed near-dup path (the 100 TB variant)
    pinned against the exact tiled twin on sf0.01 (sf0.001 has no
    qualifying pair): no false positives, full recall of the planted
    pair set."""
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.similarity import (
        dedup_embedding_cosine,
        dedup_embedding_cosine_bucketed,
    )

    sf = "/root/testdata/sf0.01"

    def pairset(df):
        if len(df) == 0:
            return set()
        return set(zip(df["vec_id_a"].astype(int), df["vec_id_b"].astype(int)))

    e = pairset(dedup_embedding_cosine(sf).to_pandas())
    b = pairset(dedup_embedding_cosine_bucketed(sf).to_pandas())
    assert e  # sf0.01 plants at least one qualifying pair
    assert b <= e  # in-bucket scoring is exact → no false positives
    assert len(b & e) / len(e) >= 0.5  # multi-probe recall floor


def test_bpe_token_counts_kernel():
    """BPE-ish pretokenizer counts: contractions, letter/digit runs,
    punctuation runs, whitespace runs — one RE2 count per batch."""
    from cityofphiladelphia_databridge_etl_tools_ray.stages.text import bpe_token_counts

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["Hello, world! It's 42 degrees.", "", "don't we'll"]),
        }
    )
    out = bpe_token_counts(t)
    # Hello |,| world|!| It|'s| 42| degrees|. → 9; '' → 0;
    # don|'t| we|'ll → 4
    assert out.column("n_bpe_tokens").to_pylist() == [9, 0, 4]


def test_clean_string_columns_edge_cases():
    from cityofphiladelphia_databridge_etl_tools_ray.stages.text import clean_string_columns

    t = pa.table(
        {
            "name": pa.array(['a<b>"c\'d', "ééé", "", None]),
            "d": pa.array(["2024-03-01 12:30:00", "03/05/2024", "2024-12-25", "bogus"]),
        }
    )
    out = clean_string_columns(t, ["name"], date_columns=["d"])
    assert out.column("name").to_pylist() == ["abcd", None, None, None]
    d = out.column("d").to_pylist()
    assert [x is not None for x in d] == [True, True, True, False]


def test_redact_pii_kernel():
    from cityofphiladelphia_databridge_etl_tools_ray.stages.text import redact_pii

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "mail me at a.b+c@x-y.example.org or bob@ex.co today",
                    "call +1 555-010-0042 from 192.168.1.200 now",
                    "no pii here",
                    "two ips 10.0.0.1 8.8.8.8 and +44 207-946-0958",
                ]
            ),
        }
    )
    out = redact_pii(t)
    assert out.column("clean_text").to_pylist() == [
        "mail me at [EMAIL] or [EMAIL] today",
        "call [PHONE] from [IP] now",
        "no pii here",
        "two ips [IP] [IP] and [PHONE]",
    ]
    assert out.column("n_emails").to_pylist() == [2, 0, 0, 0]
    assert out.column("n_phones").to_pylist() == [0, 1, 0, 1]
    assert out.column("n_ips").to_pylist() == [0, 1, 0, 2]


def test_chunk_documents_boundaries(ray_session):
    import duckdb

    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.corpus import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        chunk_documents,
    )

    assert (CHUNK_SIZE, CHUNK_STRIDE) == (200, 150)
    sf = "/root/testdata/sf0.001"
    out = chunk_documents(sf).to_pandas()
    docs = duckdb.sql(
        f"SELECT doc_id, length(text) AS n FROM '{sf}/documents.parquet'"
    ).df()
    for _, r in docs.iterrows():
        n = int(r["n"])
        expect = 1 if n <= 200 else 1 + -(-(n - 200) // 150)
        got = out[out["doc_id"] == r["doc_id"]]
        assert len(got) == expect, (r["doc_id"], n)
        assert got["n_chunk_chars"].iloc[0] == min(n, 200)
        last = got.sort_values("chunk_idx").iloc[-1]
        # last chunk ends exactly at the doc's final char
        assert int(last["chunk_idx"]) * 150 + int(last["n_chunk_chars"]) == n


def test_chunk_explode_kernel_edges():
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.corpus import _chunk_explode

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["", "x" * 200, "y" * 201, "a" * 350 + "b"]),
        }
    )
    out = _chunk_explode(t)
    by_doc = {}
    for d, i, c in zip(
        out.column("doc_id").to_pylist(),
        out.column("chunk_idx").to_pylist(),
        out.column("chunk_text").to_pylist(),
    ):
        by_doc.setdefault(d, []).append((i, c))
    assert by_doc[1] == [(0, "")]  # empty doc -> one empty chunk
    assert by_doc[2] == [(0, "x" * 200)]  # exactly chunk_size -> 1 chunk
    assert by_doc[3] == [(0, "y" * 200), (1, "y" * 51)]  # 201 chars -> 2
    # 351 chars -> 3 chunks; overlap region repeats; last char covered
    assert [i for i, _ in by_doc[4]] == [0, 1, 2]
    assert by_doc[4][2][1] == "a" * 50 + "b"
    # empty batch
    empty = _chunk_explode(t.slice(0, 0))
    assert len(empty) == 0 and empty.schema.names == [
        "doc_id", "chunk_idx", "chunk_text", "n_chunk_chars",
    ]


def test_dedup_clusters_transitive(ray_session):
    """Union-find must close transitively: if A~B and B~C are pairs but
    A~C is not, all three still share one cluster (min id), and
    n_members counts the whole component."""
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.corpus import (
        dedup_clusters,
        dedup_ngram_jaccard,
    )

    sf = "/root/testdata/sf0.001"
    pairs = dedup_ngram_jaccard(sf).to_pandas()
    out = dedup_clusters(sf).to_pandas()
    # every doc in a pair is labeled, no others
    docs_in_pairs = set(pairs["doc_id_a"]) | set(pairs["doc_id_b"])
    assert set(out["doc_id"]) == docs_in_pairs
    # cluster id is the component minimum and a member of the cluster
    for cid, grp in out.groupby("cluster_id"):
        assert cid == grp["doc_id"].min()
        assert (grp["n_members"] == len(grp)).all()
    # transitivity: labels must be a fixpoint of one propagation step
    lbl = dict(zip(out["doc_id"], out["cluster_id"]))
    for a, b in zip(pairs["doc_id_a"], pairs["doc_id_b"]):
        assert lbl[a] == lbl[b]


def test_dedup_clusters_distributed_matches_unionfind(ray_session):
    """Label propagation must converge to the identical labeling the
    union-find finisher produces (same pairs, same canonical ids)."""
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.corpus import (
        dedup_clusters,
        dedup_clusters_distributed,
    )

    sf = "/root/testdata/sf0.001"
    uf = (
        dedup_clusters(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    lp = (
        dedup_clusters_distributed(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert uf[["doc_id", "cluster_id", "n_members"]].equals(
        lp[["doc_id", "cluster_id", "n_members"]]
    )


def test_corpus_neardup_keep_canonical_only(ray_session):
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.corpus import (
        corpus_neardup_keep,
        dedup_clusters,
    )

    sf = "/root/testdata/sf0.001"
    labels = dedup_clusters(sf).to_pandas()
    kept = set(corpus_neardup_keep(sf).to_pandas()["doc_id"])
    dropped = set(labels.loc[labels["doc_id"] != labels["cluster_id"], "doc_id"])
    canon = set(labels.loc[labels["doc_id"] == labels["cluster_id"], "doc_id"])
    assert kept.isdisjoint(dropped)
    assert canon <= kept  # every cluster survives through its canonical doc


def test_normalize_text_kernel():
    from cityofphiladelphia_databridge_etl_tools_ray.stages.text import normalize_text

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["  Hello\t\tWORLD \n", "", "éÉ  x"]),
        }
    )
    out = normalize_text(t)
    assert out.column("norm_text").to_pylist() == ["hello world", "", "éé x"]
    assert out.column("n_norm_chars").to_pylist() == [11, 0, 4]


def test_propagate_clusters_long_chain(ray_session):
    """A 40-node path graph (diameter 39 — far deeper than any real
    dup cluster) must still converge to one component labeled by its
    minimum node, within the round budget, along with disjoint side
    components."""
    import ray

    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.corpus import _propagate_clusters

    chain = [(i, i + 1) for i in range(100, 140)]  # path: 100..140
    extra = [(7, 3), (3, 55), (200, 201)]  # star + separate pair
    t = pa.table(
        {
            "doc_id_a": pa.array([a for a, _ in chain + extra], pa.int64()),
            "doc_id_b": pa.array([b for _, b in chain + extra], pa.int64()),
        }
    )
    out = (
        _propagate_clusters(ray.data.from_arrow(t), max_rounds=64)
        .to_pandas()
        .sort_values("doc_id")
    )
    # pointer jumping: O(log diameter) rounds, not O(diameter)
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines import corpus as _c

    assert _c._LAST_PROPAGATE_ROUNDS <= 8
    lab = dict(zip(out["doc_id"], out["cluster_id"]))
    assert all(lab[i] == 100 for i in range(100, 141))
    assert lab[7] == lab[3] == lab[55] == 3
    assert lab[200] == lab[201] == 200
    sizes = dict(zip(out["doc_id"], out["n_members"]))
    assert sizes[100] == 41 and sizes[3] == 3 and sizes[200] == 2


def test_cluster_ops_on_dup_free_corpus(ray_session, tmp_path):
    """A corpus with no near-dup pairs must label nothing and keep
    everything (regression: empty to_pandas drops columns; empty
    labels groupby has no count column)."""
    import pyarrow.parquet as pq

    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.corpus import (
        corpus_neardup_keep,
        dedup_clusters,
        dedup_clusters_distributed,
    )

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "alpha beta gamma delta epsilon zeta",
                    "one two three four five six seven",
                    "red orange yellow green blue indigo",
                ]
            ),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["src1"] * 3),
            "n_chars": pa.array([36, 33, 35], pa.int64()),
        }
    )
    sf = str(tmp_path)
    pq.write_table(docs, f"{sf}/documents.parquet")
    assert len(dedup_clusters(sf)) == 0
    assert dedup_clusters_distributed(sf).count() == 0
    assert sorted(corpus_neardup_keep(sf).to_pandas()["doc_id"]) == [1, 2, 3]


def test_normalize_text_space_only_trim():
    """Trim is space-only on BOTH sides (explicit char list in SQL):
    bare unicode trims diverge between DuckDB and Arrow (\\x0b,
    \\u2028), so the kernel + oracle pin the explicit form."""
    import duckdb

    from cityofphiladelphia_databridge_etl_tools_ray.stages.text import normalize_text

    texts = [
        "  Padded Text  ",
        "\u00a0keep nbsp edges\u00a0",
        "\x0bkeep vtab\x0b",
        " MiXeD  CaSe\tTabs ",
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    got = normalize_text(t).column("norm_text").to_pylist()
    exp = [
        duckdb.sql(
            "SELECT trim(regexp_replace(lower(?), '\\s+', ' ', 'g'), ' ')",
            params=[x],
        ).fetchone()[0]
        for x in texts
    ]
    assert got == exp
    assert got[0] == "padded text"
    assert got[1] == "\u00a0keep nbsp edges\u00a0"  # nbsp is not RE2 \s


def test_propagate_clusters_random_graph_vs_unionfind(ray_session):
    """Distributed label propagation equals union-find on a seeded
    random graph (200 nodes, 150 edges — many components of varied
    shape, plus self-loops and duplicate edges)."""
    import ray

    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.corpus import (
        _propagate_clusters,
        _unionfind_cluster_table,
    )

    rng = np.random.default_rng(1234)
    a = rng.integers(0, 200, 150).astype(np.int64)
    b = rng.integers(0, 200, 150).astype(np.int64)
    t = pa.table({"doc_id_a": pa.array(a), "doc_id_b": pa.array(b)})
    exp = (
        _unionfind_cluster_table(a, b)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = (
        _propagate_clusters(ray.data.from_arrow(t), max_rounds=32)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got[["doc_id", "cluster_id", "n_members"]].astype("int64").equals(
        exp[["doc_id", "cluster_id", "n_members"]].astype("int64")
    )


def test_dedup_incremental_rejects_existing_and_counts_copies(ray_session, tmp_path):
    # hand-built corpus: src0 = existing lake, src1 = new batch.
    # "alpha beta" exists -> rejected; "gamma" new twice -> admitted
    # once with n_new_copies=2; "delta" new once -> admitted.
    import pyarrow.parquet as pq
    import ray  # noqa: F401

    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.corpus import (
        corpus_dedup_incremental,
    )

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 10, 11, 12, 13], pa.int64()),
            "source": pa.array(["src0", "src0", "src1", "src1", "src1", "src1"]),
            "text": pa.array(
                ["alpha beta", "other", "ALPHA   beta", "gamma", "gamma", "delta"]
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = (
        corpus_dedup_incremental(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # "ALPHA   beta" normalizes to "alpha beta" -> rejected (exists in src0)
    assert out["doc_id"].tolist() == [11, 13]
    assert out.set_index("doc_id")["n_new_copies"].to_dict() == {11: 2, 13: 1}


def test_ann_lsh_recall_vs_bruteforce(ray_session):
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.similarity import (
        ann_bruteforce_topk,
        ann_lsh_topk,
    )

    bf = ann_bruteforce_topk(SF_DIR).to_pandas()
    lsh = ann_lsh_topk(SF_DIR).to_pandas()
    bf_set = set(zip(bf["qid"], bf["nid"]))
    lsh_set = set(zip(lsh["qid"], lsh["nid"]))
    # deterministic planes -> stable recall; every emitted neighbor is
    # a true scored candidate (no false sims), ranks are exact within
    # the candidate set
    assert len(bf_set & lsh_set) / len(bf_set) >= 0.5
    # determinism across runs
    again = set(map(tuple, ann_lsh_topk(SF_DIR).to_pandas()[["qid", "nid"]].to_numpy()))
    assert again == lsh_set


def test_kmeans_embeddings_matches_sequential_reference(ray_session):
    """Distributed Lloyd's (per-batch partial sums, driver combine)
    must equal a single-process numpy Lloyd's bit-for-bit in cluster
    SIZES and match inertia to float tolerance: same deterministic
    init (first k vec_ids), same round count, argmin tie-break is
    index-ordered in both."""
    import pyarrow.parquet as pq

    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.similarity import (
        KMEANS_K,
        KMEANS_ROUNDS,
        kmeans_embeddings,
    )

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").reset_index(drop=True)
    X = np.stack([np.asarray(v, np.float64) for v in df["embedding"]])
    C = X[:KMEANS_K].copy()  # vec_ids are 0-based contiguous
    for _ in range(KMEANS_ROUNDS):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)
        for j in range(KMEANS_K):
            m = X[assign == j]
            if len(m):
                C[j] = m.mean(0)
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    assign = d2.argmin(1)
    exp_n = np.bincount(assign, minlength=KMEANS_K)
    exp_inertia = np.zeros(KMEANS_K)
    np.add.at(exp_inertia, assign, d2[np.arange(len(X)), assign])

    got = kmeans_embeddings(SF_DIR)
    assert got["cluster"].tolist() == list(range(KMEANS_K))
    assert got["n"].tolist() == exp_n.tolist()
    np.testing.assert_allclose(got["inertia"].to_numpy(), exp_inertia, rtol=1e-9)


def test_embedding_quantize_int8_bounds(ray_session):
    """Quantization invariants: codes bounded by 127, per-element
    reconstruction error bounded by half a quantization step, zero
    error only for lattice-aligned vectors."""
    import numpy as np

    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import QUERIES

    df = QUERIES["embedding_quantize_int8"]("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    assert (df["max_code"] <= 127).all() and (df["max_code"] >= 0).all()
    assert (df["max_abs"] > 0).all()
    # per-element error <= (step/2)^2, step = max_abs/127; d from the table
    import pyarrow.parquet as pq

    d = len(
        pq.read_table("/root/testdata/sf0.001/embeddings.parquet", columns=["embedding"])
        .column("embedding")[0]
    )
    bound = d * (df["max_abs"] / 254.0) ** 2
    assert (df["l2_err"] <= bound + 1e-12).all()


def test_ann_int8_rescore_recall_vs_exact(ray_session):
    """The int8 two-stage path must recover (almost) the exact top-k:
    candidates survive a 4k-wide integer-score cut, then exact
    rescoring ranks them — recall >= 0.9 overall on the synth corpus,
    and every returned (qid, nid, rank) that matches the exact twin's
    qid set keeps the exact tie-break ordering contract."""
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    exact = QUERIES["ann_bruteforce_topk"](sf).to_pandas()
    got = QUERIES["ann_int8_rescore_topk"](sf).to_pandas()
    e = set(map(tuple, exact[["qid", "nid"]].itertuples(index=False)))
    g = set(map(tuple, got[["qid", "nid"]].itertuples(index=False)))
    assert len(g) == len(got)  # no duplicate (qid, nid)
    recall = len(e & g) / len(e)
    assert recall >= 0.9, recall
    # per-qid result count mirrors the exact twin
    assert got.groupby("qid").size().to_dict() == exact.groupby("qid").size().to_dict()


def test_ngram_jaccard_indexed_equals_dense_twin(ray_session, tmp_path):
    """The prefix-filtered inverted-index join must equal the dense
    O(n²) twin EXACTLY — including on an adversarial corpus: a hot
    shingle shared by every doc (prefix filtering must still find all
    pairs), near-threshold pairs on both sides of τ, exact duplicates,
    and size-filter boundary pairs."""
    import pyarrow.parquet as pq

    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import QUERIES

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the hat"),          # near-dup of 1
        (3, "the cat sat on the mat"),          # exact dup of 1
        (4, "a completely different sentence about the weather"),
        (5, "the " * 30 + "end"),               # hot shingle 'the the'
        (6, "the " * 30 + "end"),               # dup of 5
        (7, "x y"),                             # tiny doc, 1 shingle
        (8, "x y"),                             # dup of 7
        (9, "x z"),                             # shares nothing with 7
        (10, "the cat sat on the mat today ok") # below-threshold vs 1
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs]),
            "lang": pa.array(["en"] * len(docs)),
            "source": pa.array(["s"] * len(docs)),
            "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
        }
    )
    d = tmp_path / "adv"; d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    def canon(ds):
        df = ds.to_pandas().sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)
        return df[["doc_id_a", "doc_id_b", "jaccard_e6"]]

    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.corpus import (
        dedup_ngram_jaccard_indexed,
    )

    dense = canon(QUERIES["dedup_ngram_jaccard"](str(d)))
    # plan="indexed" forces the prefix-filtered join — auto-routing
    # would (correctly) pick the dense twin on a 10-doc corpus and
    # this equality would test nothing
    indexed = canon(dedup_ngram_jaccard_indexed(str(d), plan="indexed"))
    import pandas as pd

    pd.testing.assert_frame_equal(indexed, dense)
    # sanity on the adversarial shape: the dup pairs are found
    pairs = set(map(tuple, dense[["doc_id_a", "doc_id_b"]].itertuples(index=False)))
    assert {(1, 3), (5, 6), (7, 8)} <= pairs
    assert (1, 10) not in pairs or dense.set_index(["doc_id_a", "doc_id_b"]).loc[(1, 10), "jaccard_e6"] >= 500000


def test_ngram_jaccard_plan_routing(ray_session, tmp_path):
    """The auto plan must (a) pick dense below the size cutoff, and
    above it pick (b) dense for a flat/hot vocabulary — the regime
    where prefix filtering prunes nothing and the measured 40× unit-
    cost gap makes the index join lose — but (c) indexed for a
    heavy-tailed vocabulary where most shingles are near-unique."""
    import pyarrow.parquet as pq

    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.corpus import (
        _DENSE_CUTOFF_DOCS,
        _jaccard_plan_choice,
        JACCARD_TAU,
    )

    def write(name, texts):
        d = tmp_path / name
        d.mkdir()
        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["s"] * len(texts)),
                "n_chars": pa.array([len(x) for x in texts], pa.int64()),
            }
        )
        pq.write_table(t, str(d / "documents.parquet"))
        return str(d)

    n = _DENSE_CUTOFF_DOCS + 512
    # (a) small corpus → dense regardless of vocabulary
    small = write("small", ["totally unique words %d here" % i for i in range(64)])
    assert _jaccard_plan_choice(small, JACCARD_TAU) == "dense"
    # (b) hot vocabulary above the cutoff: every doc shares one tiny
    # shingle set → every element's df ≈ n → candidate work ≈ n²
    hot = write("hot", ["the cat sat on the mat again today"] * n)
    assert _jaccard_plan_choice(hot, JACCARD_TAU) == "dense"
    # (c) heavy tail above the cutoff: shingles are essentially
    # unique per doc → candidate work ≈ vocabulary size ≪ n²
    tail = write(
        "tail",
        ["alpha%d beta%d gamma%d delta%d epsilon%d" % (i, i, i, i, i) for i in range(n)],
    )
    assert _jaccard_plan_choice(tail, JACCARD_TAU) == "indexed"


from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _set_pairs(draw):
    universe = list(range(draw(st.integers(4, 40))))
    a = draw(st.sets(st.sampled_from(universe), min_size=1, max_size=len(universe)))
    b = draw(st.sets(st.sampled_from(universe), min_size=1, max_size=len(universe)))
    order = draw(st.permutations(universe))  # arbitrary canonical order
    return sorted(a), sorted(b), {e: r for r, e in enumerate(order)}


@settings(max_examples=400, deadline=None)
@given(_set_pairs())
def test_prefix_filter_lemma(case):
    """The lossless-candidate-generation lemma dedup_ngram_jaccard_indexed
    relies on: under ANY global canonical element order, a pair with
    J ≥ τ shares its canonically-smallest common element inside BOTH
    τ-prefixes (prefix length |s| − ⌈τ·|s|⌉ + 1)."""
    import math

    a, b, rank = case
    tau = 0.5
    inter = set(a) & set(b)
    union = set(a) | set(b)
    if not inter or len(inter) / len(union) < tau:
        return  # lemma only claims anything for qualifying pairs
    ca = sorted(a, key=lambda e: rank[e])
    cb = sorted(b, key=lambda e: rank[e])
    pa_len = len(a) - math.ceil(tau * len(a)) + 1
    pb_len = len(b) - math.ceil(tau * len(b)) + 1
    e_star = min(inter, key=lambda e: rank[e])
    assert e_star in ca[:pa_len], (ca, pa_len, e_star)
    assert e_star in cb[:pb_len], (cb, pb_len, e_star)
    # and the length filter never drops a qualifying pair
    assert min(len(a), len(b)) >= tau * max(len(a), len(b)) - 1e-9


def test_tagged_lexsort_intersection_kernel():
    """The vectorized all-pairs intersection in the index join's
    verify stage (tag each element with its candidate id, lexsort,
    count adjacent duplicates) must equal per-pair np.intersect1d on
    randomized unique-set pairs — each side unique within a pair, so
    every adjacent duplicate is exactly one intersection element."""
    rng = np.random.default_rng(7)
    for _ in range(100):
        n = int(rng.integers(1, 20))
        sa = [np.unique(rng.integers(0, 50, rng.integers(1, 30)).astype(np.uint64)) for _ in range(n)]
        sb = [np.unique(rng.integers(0, 50, rng.integers(1, 30)).astype(np.uint64)) for _ in range(n)]
        fa = np.concatenate(sa); oa = np.r_[0, np.cumsum([len(s) for s in sa])]
        fb = np.concatenate(sb); ob = np.r_[0, np.cumsum([len(s) for s in sb])]
        ids = np.arange(n, dtype=np.int64)
        pid = np.concatenate([np.repeat(ids, np.diff(oa)), np.repeat(ids, np.diff(ob))])
        el = np.concatenate([fa, fb])
        order = np.lexsort((el, pid))
        p_s, e_s = pid[order], el[order]
        dup = (p_s[1:] == p_s[:-1]) & (e_s[1:] == e_s[:-1])
        inter = np.bincount(p_s[1:][dup], minlength=n)
        exp = np.array(
            [np.intersect1d(a, b, assume_unique=True).size for a, b in zip(sa, sb)]
        )
        np.testing.assert_array_equal(inter, exp)
