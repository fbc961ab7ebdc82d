"""`knn_classify` (kNN majority-vote label prediction): hand-computed
geometry incl. a vote tie broken to the smallest label, the exact
DuckDB oracle, and a naive single-process twin on the sf corpus."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _write_emb(tmp_path, vecs, labels):
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def _naive(vecs, labels, n_queries, k):
    m = np.asarray(vecs, np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.round(m @ m.T, 4)
    labels = np.asarray(labels, np.int64)
    rows = []
    for qid in range(n_queries):
        ids = np.flatnonzero(np.arange(len(m)) != qid)
        s = sims[qid, ids]
        top = ids[np.lexsort((ids, -s))[:k]]
        votes = {}
        for lab in labels[top]:
            votes[int(lab)] = votes.get(int(lab), 0) + 1
        pred = min(votes, key=lambda lab: (-votes[lab], lab))
        rows.append((qid, int(labels[qid]), pred, votes[pred]))
    return pd.DataFrame(rows, columns=["query_id", "true_label",
                                       "pred_label", "votes"])


@pytest.mark.usefixtures("ray_session")
def test_geometry_vote_tie_and_oracle(tmp_path):
    import duckdb

    from ray_script_extract.pipelines.similarity import (
        KNN_CLASSIFY_SQL,
        knn_classify,
    )

    # Unit circle, k=5 over exactly 5 non-self vectors.  Query 0
    # (label 7 at 0°): neighbors carry labels [3, 3, 5, 5, 9] — a
    # 2-2 vote tie between 3 and 5 that must break to label 3.
    # Query 1 (label 3 at 5°): same five neighbors minus itself plus
    # query 0, labels [7, 3, 5, 5, 9] → clean winner 5 with 2 votes.
    deg = [0, 5, 10, 20, 30, 40]
    labels = [7, 3, 3, 5, 5, 9]
    vecs = [(np.cos(np.radians(d)), np.sin(np.radians(d))) for d in deg]
    sf = _write_emb(tmp_path, vecs, labels)

    got = knn_classify(sf, n_queries=2, k=5).to_pandas() \
        .reset_index(drop=True)
    assert got["query_id"].tolist() == [0, 1]
    assert got["pred_label"].tolist() == [3, 5]
    assert got["votes"].tolist() == [2, 2]
    assert got["true_label"].tolist() == [7, 3]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    want = con.execute(KNN_CLASSIFY_SQL.replace(
        "vec_id < 8", "vec_id < 2")).df()
    pd.testing.assert_frame_equal(
        got.astype(np.int64), want.astype(np.int64))


@pytest.mark.usefixtures("ray_session")
def test_matches_naive_on_sf_corpus():
    from ray_script_extract.pipelines.similarity import knn_classify

    t = pq.read_table(f"{SF}/embeddings.parquet")
    vecs = np.vstack(t["embedding"].to_numpy(zero_copy_only=False))
    labels = np.asarray(t["label"])
    assert np.array_equal(np.asarray(t["vec_id"]), np.arange(len(vecs)))

    want = _naive(vecs, labels, n_queries=8, k=5)
    got = knn_classify(SF, n_queries=8, k=5).to_pandas() \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(np.int64),
                                  want.astype(np.int64))
    assert len(got) == 8
