"""Approximate nearest-neighbor search over the embedding column.

Brute-force cosine top-k lives in queries.py (`knn_cosine`, oracle-
checked).  This module adds the scale path: IVF — k-means coarse
quantizer (deterministic seeding), vectors bucketed by nearest
centroid, queries probe only ``n_probe`` buckets.  At 10^12 rows the
bucket assignment is a map stage keyed for locality and the probe set
shrinks the scanned fraction to n_probe/n_clusters; here both paths
run on the same table so recall is measurable (tests assert it).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _load_matrix(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"])
    mat = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def kmeans_fit(mat: np.ndarray, n_clusters: int, n_iter: int = 10) -> np.ndarray:
    """Deterministic k-means on normalized vectors: centroids seeded
    from evenly-spaced input rows (no RNG), Lloyd iterations."""
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    idx = np.linspace(0, len(norm) - 1, n_clusters).astype(np.int64)
    centroids = norm[idx].copy()
    for _ in range(n_iter):
        sims = norm @ centroids.T
        assign = sims.argmax(axis=1)
        for c in range(n_clusters):
            members = norm[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    centroids[c] = m / n
    return centroids


def knn_cosine_ivf(sf_dir: str, n_queries: int = 4, k: int = 5,
                   n_clusters: int = 16, n_probe: int = 4):
    """IVF approximate top-k: assign → probe → per-bucket scan.

    Returns (query_id, vec_id, rank) ordered rows.  Approximate by
    construction → rows-only correctness; recall vs the brute-force
    path is asserted in tests."""
    ids, mat = _load_matrix(sf_dir)
    centroids = kmeans_fit(mat, n_clusters)
    q_ids = ids[:n_queries]
    q = mat[:n_queries]
    q_norm = q / np.linalg.norm(q, axis=1, keepdims=True)
    # probe sets per query
    q_sims = q_norm @ centroids.T
    probe_sets = np.argsort(-q_sims, axis=1)[:, :n_probe]
    bc = ray.put((centroids, q_ids, q_norm, probe_sets))

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def scan(batch: pa.Table) -> pa.Table:
        centroids, q_ids, q_norm, probe_sets = ray.get(bc)
        vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        m = np.vstack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        assign = (m @ centroids.T).argmax(axis=1)
        out_q: List[int] = []
        out_v: List[int] = []
        out_s: List[float] = []
        for qi in range(len(q_ids)):
            probed = np.isin(assign, probe_sets[qi])
            probed &= vec_ids != q_ids[qi]
            if not probed.any():
                continue
            sims = m[probed] @ q_norm[qi]
            out_q.extend([int(q_ids[qi])] * int(probed.sum()))
            out_v.extend(vec_ids[probed].tolist())
            out_s.extend(np.round(sims, 4).tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })

    scored = ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["score", "vec_id"],
                            ascending=[False, True]).head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["query_id", "vec_id", "rank"]]

    return (scored.groupby("query_id").map_groups(topk, batch_format="pandas")
                  .sort(["query_id", "rank"]))
