"""`mine_hard_negatives` (DPR/SBERT contrastive-pair mining): hand-
computed geometry on a crafted embedding table, the unique-label
drop rule, the exact DuckDB oracle, and a naive single-process twin
on the sf corpus."""

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


def _naive(vecs, labels, n_queries):
    m = np.asarray(vecs, np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.round(m @ m.T, 4)
    labels = np.asarray(labels)
    rows = []
    for qid in range(n_queries):
        best = {}
        for is_pos in (True, False):
            mask = (np.arange(len(m)) != qid) & \
                   ((labels == labels[qid]) == is_pos)
            if not mask.any():
                best[is_pos] = None
                continue
            ids = np.flatnonzero(mask)
            s = sims[qid, ids]
            j = np.lexsort((ids, -s))[0]
            best[is_pos] = (int(ids[j]), float(s[j]))
        if best[True] and best[False]:
            rows.append((qid, *best[True], *best[False]))
    return pd.DataFrame(rows, columns=["query_id", "pos_id", "pos_score",
                                       "neg_id", "neg_score"])


@pytest.mark.usefixtures("ray_session")
def test_geometry_and_unique_label_drop(tmp_path):
    import duckdb

    from ray_script_extract.pipelines.similarity import (
        HARD_NEGATIVES_SQL,
        mine_hard_negatives,
    )

    # 2-D unit-circle geometry, hand-checkable: query 0 (label 1, 0°)
    # has its closest same-label vector at 10° (id 2) and closest
    # other-label at 5° (id 3) — the hard negative is CLOSER than the
    # positive, the exact situation the op exists to surface.
    # Query 1 (label 9) is the only label-9 vector → dropped.
    deg = [0, 90, 10, 5, 170, 20]
    labels = [1, 9, 1, 2, 2, 1]
    vecs = [(np.cos(np.radians(d)), np.sin(np.radians(d))) for d in deg]
    sf = _write_emb(tmp_path, vecs, labels)

    got = mine_hard_negatives(sf, n_queries=2).to_pandas() \
        .reset_index(drop=True)
    assert got["query_id"].tolist() == [0]       # query 1 dropped
    row = got.iloc[0]
    assert (int(row.pos_id), int(row.neg_id)) == (2, 3)
    assert row.neg_score > row.pos_score         # negative is harder

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    want = con.execute(HARD_NEGATIVES_SQL.replace(
        "vec_id < 8", "vec_id < 2")).df()
    pd.testing.assert_frame_equal(
        got.astype({c: np.int64 for c in ("query_id", "pos_id", "neg_id")}),
        want.astype({c: np.int64 for c in ("query_id", "pos_id", "neg_id")}))


@pytest.mark.usefixtures("ray_session")
def test_matches_naive_on_sf_corpus():
    from ray_script_extract.pipelines.similarity import mine_hard_negatives

    t = pq.read_table(f"{SF}/embeddings.parquet")
    vecs = np.vstack(t["embedding"].to_numpy(zero_copy_only=False))
    labels = np.asarray(t["label"])
    # table must be vec_id-ordered for the naive index == id mapping
    assert np.array_equal(np.asarray(t["vec_id"]), np.arange(len(vecs)))

    want = _naive(vecs, labels, n_queries=8)
    got = mine_hard_negatives(SF, n_queries=8).to_pandas() \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype(want.dtypes.to_dict()), want)
    assert len(got) > 0
