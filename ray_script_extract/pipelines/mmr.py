"""Maximal-marginal-relevance reranking over the embedding corpus.

The retrieval-side diversity operator (Carbonell & Goldstein, SIGIR'98
— "The Use of MMR, Diversity-Based Reranking"): pick k results that
are RELEVANT to the query but not redundant with each other,

    MMR(d) = lam * rel(d) − (1 − lam) * max_{s∈selected} sim(d, s).

Greedy MMR is inherently sequential in the selected set, so the
production shape — and the one implemented here — is a two-stage
rerank:

1. **Distributed relevance scan** (the knn_cosine discipline,
   queries.py:1843): the query vector broadcasts once, every batch
   does one matmul and prunes to its local top-C, one bounded
   sort+limit yields the global top-``candidates`` set.  This is the
   only pass over the corpus.
2. **Exact greedy MMR over the bounded candidate set** driver-side:
   the C candidate vectors come from a ROW-FILTERED read (vec_id ∈
   candidates — C rows regardless of corpus size), the C×C similarity
   matrix is one matmul, and each of the k selection steps is a
   vectorized argmax.  Deterministic ties: higher score, then smaller
   vec_id.

With ``candidates >= |corpus|`` the result is EXACT corpus-wide MMR —
tests/test_mmr.py pins stage-2 against a naive per-step twin and the
full pipeline against an all-candidates run at sf0.001.  Rows-only
correctness (argmax chains are not SQL-expressible).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data


def mmr_select(cand_ids: np.ndarray, cand_vecs: np.ndarray,
               rel: np.ndarray, k: int, lam: float) -> List[int]:
    """Greedy MMR over a bounded candidate set.  ``cand_vecs`` must be
    row-normalized; returns the selected candidate INDICES in
    selection order."""
    n = len(cand_ids)
    if n == 0:
        return []
    sims = cand_vecs @ cand_vecs.T  # C×C, bounded by construction
    selected: List[int] = []
    max_sim = np.full(n, -np.inf)
    avail = np.ones(n, bool)
    for _ in range(min(k, n)):
        if selected:
            score = lam * rel - (1.0 - lam) * max_sim
        else:
            score = lam * rel  # first pick: pure relevance
        score = np.round(score, 6)
        score[~avail] = -np.inf
        # deterministic: highest score, then smallest vec_id
        order = np.lexsort((cand_ids, -score))
        pick = int(order[0])
        selected.append(pick)
        avail[pick] = False
        max_sim = np.maximum(max_sim, sims[:, pick])
    return selected


def rerank_mmr(sf_dir: str, query_id: int = 0, k: int = 16,
               candidates: int = 128, lam: float = 0.7) -> pd.DataFrame:
    """Top-k diverse results for one query vector; returns
    (rank, vec_id, rel_score) in selection order."""
    from .joins import sorted_small
    from .similarity import _query_matrix

    q_ids, q = _query_matrix(sf_dir, query_id + 1)
    q_norm = (q / np.linalg.norm(q, axis=1, keepdims=True))[query_id]
    q_ref = ray.put(q_norm)

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        m = np.vstack(batch.column("embedding")
                      .to_numpy(zero_copy_only=False)).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = np.round(m @ qv, 4)
        keep = vec_ids != query_id
        v, s = vec_ids[keep], sims[keep]
        top = np.lexsort((v, -s))[:candidates]  # batch-local prune
        return pa.table({"vec_id": pa.array(v[top], pa.int64()),
                         "rel_score": pa.array(s[top], pa.float64())})

    cand = (sorted_small(ds.map_batches(score, batch_format="pyarrow",
                                        zero_copy_batch=True),
                         ["rel_score", "vec_id"],
                         descending=[True, False])
            .limit(candidates).to_pandas())

    cand_ids = cand["vec_id"].to_numpy(np.int64)
    rel = cand["rel_score"].to_numpy(np.float64)
    # bounded row-filtered read: C candidate vectors, never the corpus
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "in", cand_ids.tolist())])
    got_ids = np.asarray(t["vec_id"], np.int64)
    vecs = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)) \
        .astype(np.float64)
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    pos = {int(v): i for i, v in enumerate(got_ids)}
    vecs = vecs[[pos[int(v)] for v in cand_ids]]

    sel = mmr_select(cand_ids, vecs, rel, k, lam)
    return pd.DataFrame({
        "rank": np.arange(1, len(sel) + 1, dtype=np.int64),
        "vec_id": cand_ids[sel],
        "rel_score": rel[sel],
    })
