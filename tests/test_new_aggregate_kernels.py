"""Edge-case tests for the round-2 aggregate/window additions: RANK
tie semantics, modal-type tie-break, INTERSECT membership, tf-idf
short-doc behavior, audio-meta determinism — on hand-crafted tiny
tables (the sf-scale oracle equivalence lives in
test_queries_oracle.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
    events_type_argmax,
    events_user_modal_type,
    events_user_value_rank,
    users_click_and_purchase,
)
from cityofphiladelphia_databridge_etl_tools_ray.pipelines.corpus import (
    corpus_tfidf_top_terms,
)


def _write_events(tmp_path, rows):
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["p"] * len(rows), pa.string()),
            "ts": pa.array(
                [pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=r[0]) for r in rows],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_rank_ties_share_rank_with_gaps(ray_session, tmp_path):
    # user 7: values 5.0, 5.0, 3.0 → rn 1,2,3; RANK 1,1,3 (gap after tie)
    sf = _write_events(
        tmp_path,
        [(1, 7, "click", 5.0), (2, 7, "view", 5.0), (3, 7, "click", 3.0)],
    )
    df = (
        events_user_value_rank(sf)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert df["rn"].tolist() == [1, 2, 3]
    assert df["rnk"].tolist() == [1, 1, 3]


def test_modal_type_lexicographic_tie_break(ray_session, tmp_path):
    # user 1: click ×2, error ×2 → 'click' (lexicographically smaller)
    sf = _write_events(
        tmp_path,
        [(1, 1, "click", 1.0), (2, 1, "error", 1.0), (3, 1, "click", 1.0), (4, 1, "error", 1.0)],
    )
    df = events_user_modal_type(sf).to_pandas()
    assert df.loc[df.user_id == 1, "modal_type"].item() == "click"
    assert df.loc[df.user_id == 1, "n"].item() == 2


def test_argmax_tie_picks_min_event_id(ray_session, tmp_path):
    sf = _write_events(
        tmp_path,
        [(5, 1, "click", 9.0), (2, 2, "click", 9.0), (9, 3, "click", 1.0)],
    )
    df = events_type_argmax(sf).to_pandas()
    assert df.loc[df.event_type == "click", "top_event_id"].item() == 2


def test_intersect_requires_both_types(ray_session, tmp_path):
    sf = _write_events(
        tmp_path,
        [
            (1, 1, "click", 1.0),
            (2, 1, "purchase", 1.0),
            (3, 2, "click", 1.0),  # click only
            (4, 3, "purchase", 1.0),  # purchase only
        ],
    )
    got = sorted(users_click_and_purchase(sf).to_pandas()["user_id"].tolist())
    assert got == [1]


def test_tfidf_short_and_empty_docs(ray_session, tmp_path):
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a a b", "", "b c"], pa.string()),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([5, 0, 3], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    df = (
        corpus_tfidf_top_terms(str(tmp_path))
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    # doc 2 (empty) contributes no rows; doc 1: 'a' (tf=2, df=1,
    # score 2e6) over 'b' (tf=1, df=2, score 5e5)
    assert df["doc_id"].tolist() == [1, 1, 3, 3]
    d1 = df[df.doc_id == 1]
    assert d1["term"].tolist() == ["a", "b"]
    assert d1["score"].tolist() == [2_000_000, 500_000]
    # doc 3 tie on score? b: tf1/df2=5e5; c: tf1/df1=1e6 → c first
    d3 = df[df.doc_id == 3]
    assert d3["term"].tolist() == ["c", "b"]


def test_audio_meta_duration_consistency(ray_session, tmp_path):
    from cityofphiladelphia_databridge_etl_tools_ray.stages.multimodal import FakeCodec

    payloads = np.array([b"hello", b"world", b""], dtype=object)
    rate, ch, n_samples = FakeCodec().audio_meta(payloads)
    assert rate.dtype == np.int32 and ch.dtype == np.int32
    assert set(rate.tolist()) <= {16000, 22050, 44100, 48000}
    assert set(ch.tolist()) <= {1, 2}
    # duration is an exact whole-second multiple of the rate
    assert np.all(n_samples % rate.astype(np.int64) == 0)
    secs = n_samples // rate.astype(np.int64)
    assert np.all((1 <= secs) & (secs <= 30))
    # deterministic
    rate2, ch2, n2 = FakeCodec().audio_meta(payloads)
    assert np.array_equal(rate, rate2) and np.array_equal(n_samples, n2)
