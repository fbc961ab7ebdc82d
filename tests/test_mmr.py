"""MMR reranking (pipelines/mmr.py): greedy selection pinned against
a naive per-step twin, and the two-stage pipeline against exact
corpus-wide MMR when candidates cover the whole corpus."""

from __future__ import annotations

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def naive_mmr(cand_ids, vecs, rel, k, lam):
    """Per-step recompute twin: literal MMR definition."""
    selected = []
    remaining = list(range(len(cand_ids)))
    while remaining and len(selected) < k:
        best, best_key = None, None
        for i in remaining:
            if selected:
                ms = max(float(vecs[i] @ vecs[j]) for j in selected)
                s = lam * rel[i] - (1 - lam) * ms
            else:
                s = lam * rel[i]
            key = (-round(s, 6), cand_ids[i])
            if best_key is None or key < best_key:
                best, best_key = i, key
        selected.append(best)
        remaining.remove(best)
    return selected


def test_mmr_select_equals_naive():
    from ray_script_extract.pipelines.mmr import mmr_select

    rng = np.random.default_rng(3)
    for trial in range(10):
        n = rng.integers(3, 40)
        d = 8
        vecs = rng.normal(size=(n, d))
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        rel = np.round(rng.uniform(0, 1, n), 4)
        ids = np.sort(rng.choice(1000, size=n, replace=False)).astype(
            np.int64)
        k = int(rng.integers(1, n + 1))
        lam = float(rng.choice([0.3, 0.5, 0.7, 1.0]))
        got = mmr_select(ids, vecs, rel, k, lam)
        want = naive_mmr(ids, vecs, rel, k, lam)
        assert got == want, f"trial {trial}"


def test_mmr_degenerate():
    from ray_script_extract.pipelines.mmr import mmr_select

    assert mmr_select(np.array([], np.int64),
                      np.zeros((0, 4)), np.array([]), 5, 0.7) == []
    # k larger than candidates: selects everything once
    vecs = np.eye(3)
    sel = mmr_select(np.array([7, 8, 9], np.int64), vecs,
                     np.array([0.3, 0.2, 0.1]), 10, 0.7)
    assert sorted(sel) == [0, 1, 2]


@pytest.mark.usefixtures("ray_session")
def test_rerank_pipeline_exact_when_candidates_cover_corpus():
    """candidates >= |corpus| makes the two-stage rerank EXACT
    corpus-wide MMR — compare against a single-process run."""
    import pyarrow.parquet as pq

    from ray_script_extract.pipelines.mmr import mmr_select, rerank_mmr

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"], np.int64)
    vecs = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)) \
        .astype(np.float64)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    n = len(ids)

    out = rerank_mmr(SF, query_id=0, k=10, candidates=n + 10, lam=0.7)
    assert list(out.columns) == ["rank", "vec_id", "rel_score"]
    assert len(out) == 10
    assert list(out["rank"]) == list(range(1, 11))

    # single-process exact MMR over everything but the query
    qv = vecs[ids == 0][0]
    keep = ids != 0
    cids, cv = ids[keep], vecs[keep]
    rel = np.round(cv @ qv, 4)
    order = np.lexsort((cids, -rel))  # relevance order, same tie rule
    cids, cv, rel = cids[order], cv[order], rel[order]
    sel = mmr_select(cids, cv, rel, 10, 0.7)
    assert list(out["vec_id"]) == [int(cids[i]) for i in sel]


@pytest.mark.usefixtures("ray_session")
def test_rerank_diversity_effect():
    """lam=1 is pure relevance (== knn order); a lower lam must not
    produce a WORSE-spread set than pure relevance on average."""
    from ray_script_extract.pipelines.mmr import rerank_mmr

    pure = rerank_mmr(SF, query_id=0, k=8, candidates=64, lam=1.0)
    div = rerank_mmr(SF, query_id=0, k=8, candidates=64, lam=0.3)
    # pure-relevance == the relevance-sorted prefix of its own output
    assert (pure["rel_score"].to_numpy()
            == np.sort(pure["rel_score"].to_numpy())[::-1]).all()
    # pure relevance maximizes the relevance sum; diversity can only
    # trade relevance away, never gain it
    assert div["rel_score"].sum() <= pure["rel_score"].sum() + 1e-9
    assert len(div) == 8 and list(div["rank"]) == list(range(1, 9))
