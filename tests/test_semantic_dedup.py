"""SemDeDup-style semantic dedup vs a single-process numpy twin with
the identical seed, plus crafted exact-duplicate scenarios where the
expected keep set is known by hand.

No reference counterpart; the operator follows Abbas et al.
(arXiv:2303.09540) re-expressed as one cluster-keyed exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _numpy_twin(sf_dir: str, n_clusters: int, eps: float, n_iter: int):
    """Single-process recomputation: same seed (bounded-sample
    kmeans_fit), same Lloyd update, same per-cluster ordering and
    strict-prior max — the distributed run must agree exactly on
    (cluster, keep) and to float tolerance on max_prior_sim."""
    from ray_script_extract.pipelines.similarity import (
        _sample_matrix, kmeans_fit)

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"], dtype=np.int64)
    m = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)) \
        .astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)

    sample = _sample_matrix(sf_dir)
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True),
                         1e-12)
    c = kmeans_fit(sample, n_clusters)
    for _ in range(n_iter):
        assign = (m @ c.T).argmax(axis=1)
        for j in np.unique(assign):
            v = m[assign == j].mean(axis=0)
            nv = np.linalg.norm(v)
            if nv > 0:
                c[j] = v / nv

    sims = m @ c.T
    assign = sims.argmax(axis=1)
    cent_sim = sims[np.arange(len(m)), assign]

    rows = []
    for cl in np.unique(assign):
        sel = np.flatnonzero(assign == cl)
        order = sel[np.lexsort((ids[sel], cent_sim[sel]))]
        x = m[order]
        s = x @ x.T
        prior = np.full(len(order), -np.inf)
        for i in range(1, len(order)):
            prior[i] = s[:i, i].max()
        for i, ridx in enumerate(order):
            rows.append((int(ids[ridx]), int(cl),
                         bool(prior[i] < 1.0 - eps),
                         float(prior[i]) if np.isfinite(prior[i])
                         else -1.0))
    df = pd.DataFrame(rows, columns=["vec_id", "cluster", "keep",
                                     "max_prior_sim"])
    return df.sort_values("vec_id").reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_matches_numpy_twin():
    from ray_script_extract.pipelines.clustering import dedup_semantic

    eps, k, it = 0.58, 8, 3
    got = dedup_semantic(SF, n_clusters=k, eps=eps, n_iter=it) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    want = _numpy_twin(SF, n_clusters=k, eps=eps, n_iter=it)

    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert got["cluster"].tolist() == want["cluster"].tolist()
    assert got["keep"].tolist() == want["keep"].tolist()
    np.testing.assert_allclose(got["max_prior_sim"],
                               want["max_prior_sim"], atol=1e-12)
    # threshold 1-0.58 = 0.42 sits inside the planted near-dup band
    # (cos 0.40-0.51): the operator must actually remove something
    assert (~got["keep"]).sum() > 0
    # exactly one row per input vector, every cluster's
    # farthest-from-centroid point survives
    assert len(got) == 500 and got["vec_id"].is_unique


def _write_emb(path, vecs):
    ids = np.arange(len(vecs), dtype=np.int64)
    pq.write_table(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(["x"] * len(vecs)),
    }), f"{path}/embeddings.parquet")


@pytest.mark.usefixtures("ray_session")
def test_exact_duplicate_groups(tmp_path):
    """Three exact-duplicate groups + two singletons, one cluster:
    exactly one representative per duplicate group survives, and it is
    the lowest-vec_id member (equal cent_sim ties break by vec_id)."""
    from ray_script_extract.pipelines.clustering import dedup_semantic

    rng = np.random.default_rng(7)
    a, b, c, s1, s2 = (rng.normal(size=8) for _ in range(5))
    vecs = [a, a, a, b, b, c, c, s1, s2]      # ids 0-8
    _write_emb(tmp_path, vecs)

    got = dedup_semantic(str(tmp_path), n_clusters=1, eps=0.01,
                         n_iter=2).to_pandas()
    kept = set(got.loc[got["keep"], "vec_id"])
    # group reps: min vec_id of {0,1,2}, {3,4}, {5,6}; singletons stay
    assert kept == {0, 3, 5, 7, 8}
    # removed rows carry the ~1.0 duplicate similarity
    removed = got.loc[~got["keep"], "max_prior_sim"]
    assert (removed > 0.999).all()


@pytest.mark.usefixtures("ray_session")
def test_eps_edges(tmp_path):
    """eps < 0 keeps everything (threshold > 1 ≥ any cosine); eps = 2
    keeps exactly one point per cluster (threshold −1; only the
    no-prior first point survives)."""
    from ray_script_extract.pipelines.clustering import dedup_semantic

    rng = np.random.default_rng(11)
    _write_emb(tmp_path, rng.normal(size=(12, 8)))

    all_kept = dedup_semantic(str(tmp_path), n_clusters=2, eps=-0.01,
                              n_iter=1).to_pandas()
    assert all_kept["keep"].all()

    one_per = dedup_semantic(str(tmp_path), n_clusters=2, eps=2.0,
                             n_iter=1).to_pandas()
    per_cluster = one_per.groupby("cluster")["keep"].sum()
    assert (per_cluster == 1).all()
    assert one_per["keep"].sum() == one_per["cluster"].nunique()
