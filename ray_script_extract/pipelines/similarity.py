"""Approximate nearest-neighbor search + near-dup over the embedding
column.

Brute-force cosine top-k lives in queries.py (`knn_cosine`, oracle-
checked).  This module adds the scale paths:

* IVF — k-means coarse quantizer fitted on a BOUNDED SAMPLE (the
  driver never loads the full embedding table), vectors bucketed by
  nearest centroid, queries probe only ``n_probe`` buckets.
* ``near_dup_embeddings_lsh`` — random-hyperplane signatures, banded
  LSH candidate generation, exact cosine verify on candidates only —
  the bucketed variant of queries.py's exact ``near_dup_embeddings``
  (which broadcasts the full matrix and is kept as ground truth).

Recall of both approximate paths vs their exact twins is asserted in
tests/test_similarity.py.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_FIT_SAMPLE_CAP = 8192  # rows the driver may hold for the k-means fit


def _read_emb(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


def _query_matrix(sf_dir: str, n_queries: int):
    """The n query vectors only — read with a row filter, never the
    full table."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", n_queries)])
    ids = np.asarray(t["vec_id"])
    mat = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def _embedding_dim(sf_dir: str) -> int:
    """Vector dimensionality from the first row of the first row
    group — bounded driver read regardless of table size."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    t = f.read_row_group(0, columns=["embedding"])
    return len(t.column(0)[0])


def _sample_matrix(sf_dir: str, cap: int = _FIT_SAMPLE_CAP) -> np.ndarray:
    """Bounded sample for the coarse-quantizer fit: the first ``cap``
    rows stream through Ray; the driver holds ≤ cap vectors no matter
    the table size (at 10^12 rows this replaces the old full-table
    driver read, which was the scale-killer)."""
    head = _read_emb(sf_dir).limit(cap).to_pandas()
    return np.vstack(head["embedding"].to_numpy()).astype(np.float64)


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
    """IVF approximate top-k: sampled fit → assign → probe →
    per-bucket scan with per-batch top-k pruning.

    Returns (query_id, vec_id, rank) ordered rows.  Approximate by
    construction → rows-only correctness; recall vs the brute-force
    path is asserted in tests."""
    centroids = kmeans_fit(_sample_matrix(sf_dir), n_clusters)
    q_ids, q = _query_matrix(sf_dir, n_queries)
    q_norm = q / np.linalg.norm(q, axis=1, keepdims=True)
    # probe sets per query
    q_sims = q_norm @ centroids.T
    probe_sets = np.argsort(-q_sims, axis=1)[:, :n_probe]
    bc = ray.put((centroids, q_ids, q_norm, probe_sets))

    ds = _read_emb(sf_dir)

    def scan(batch: pa.Table) -> pa.Table:
        centroids, q_ids, q_norm, probe_sets = ray.get(bc)
        vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        m = np.vstack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        assign = (m @ centroids.T).argmax(axis=1)
        out_q: List[np.ndarray] = []
        out_v: List[np.ndarray] = []
        out_s: List[np.ndarray] = []
        for qi in range(len(q_ids)):
            probed = np.isin(assign, probe_sets[qi])
            probed &= vec_ids != q_ids[qi]
            if not probed.any():
                continue
            sims = np.round(m[probed] @ q_norm[qi], 4)
            v = vec_ids[probed]
            top = np.lexsort((v, -sims))[:k]  # batch-local prune
            out_q.append(np.full(len(top), q_ids[qi], np.int64))
            out_v.append(v[top])
            out_s.append(sims[top])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "score": pa.array(np.concatenate(out_s), pa.float64()),
        })

    scored = ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)

    from .joins import hash_partitioned_map

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "score", "vec_id"],
                            ascending=[True, False, True], kind="stable")
        df = df.groupby("query_id", sort=False).head(k).copy()
        df["rank"] = (df.groupby("query_id", sort=False).cumcount()
                      + 1).astype(np.int64)
        return df[["query_id", "vec_id", "rank"]]

    return hash_partitioned_map(scored, ["query_id"], topk) \
        .sort(["query_id", "rank"])


_N_EMB_BANDS = 32
_EMB_BAND_BITS = 4
_EMB_SEED = 99


def _hyperplanes(dim: int) -> np.ndarray:
    """Fixed seeded random hyperplanes (n_bands*band_bits, dim) —
    regenerated identically inside every task, so nothing ships."""
    rng = np.random.RandomState(_EMB_SEED)
    return rng.standard_normal((_N_EMB_BANDS * _EMB_BAND_BITS, dim))


def near_dup_embeddings_lsh(sf_dir: str, threshold: float = 0.4):
    """Bucketed embedding near-dup: random-hyperplane LSH prefilter →
    exact cosine verify on candidate pairs only (round(cos,4) ≥ τ,
    a < b — same contract as the exact ``near_dup_embeddings``).

    Scale shape: band rows are (band_key, vec_id) only; candidate
    pairs join the embedding column back via two partitioned joins —
    the full matrix is never broadcast and no O(N²) scan happens.
    Recall is probabilistic (32 bands × 4 bits: ≥ ~99.5% at the τ=0.4
    boundary, higher above it) — asserted vs the exact path in
    tests/test_similarity.py."""

    def bands(batch: pa.Table) -> pa.Table:
        m = np.vstack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        planes = _hyperplanes(m.shape[1])
        bits = (m @ planes.T) > 0  # (n, bands*bits)
        weights = (1 << np.arange(_EMB_BAND_BITS)).astype(np.int64)
        vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        keys, ids = [], []
        for b in range(_N_EMB_BANDS):
            chunk = bits[:, b * _EMB_BAND_BITS:(b + 1) * _EMB_BAND_BITS]
            vals = chunk @ weights
            keys.append(np.char.add(f"{b}:", vals.astype(np.int64).astype(str)))
            ids.append(vec_ids)
        return pa.table({
            "band_key": pa.array(np.concatenate(keys), pa.string()),
            "doc_id": pa.array(np.concatenate(ids), pa.int64()),
        })

    from .dedup import PAIRS_SCHEMA, _bucket_pairs
    from .joins import hash_join_via_groupby

    dim = _embedding_dim(sf_dir)
    emb = _read_emb(sf_dir)
    pairs = _bucket_pairs(emb.map_batches(bands, batch_format="pyarrow",
                                          zero_copy_batch=True))

    def packed(prefix: str):
        # NORMALIZED embedding packed into ONE fixed-width binary
        # column (dim float32 little-endian): a single buffer through
        # every shuffle/merge — no per-row list objects, no
        # 130-column blocks through Ray's sort
        def fn(batch: pa.Table) -> pa.Table:
            m = np.vstack(batch.column("embedding")
                          .to_numpy(zero_copy_only=False)).astype(np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            m32 = np.ascontiguousarray(m, dtype="<f4")
            return pa.table({
                "__k": batch.column("vec_id"),
                f"{prefix}bin": pa.array(
                    [m32[i].tobytes() for i in range(len(m32))],
                    pa.binary()),
            })
        return fn

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64)})
        a = np.frombuffer(b"".join(df["a_bin"]), dtype="<f4") \
            .reshape(len(df), dim).astype(np.float64)
        b = np.frombuffer(b"".join(df["b_bin"]), dtype="<f4") \
            .reshape(len(df), dim).astype(np.float64)
        cos = np.round((a * b).sum(axis=1), 4)
        keep = cos >= threshold
        return pd.DataFrame({
            "id_a": df["id_a"].to_numpy()[keep].astype(np.int64),
            "id_b": df["id_b"].to_numpy()[keep].astype(np.int64),
        })

    def side_schema(prefix: str) -> "pa.Schema":
        return pa.schema([("__k", pa.int64()),
                          (f"{prefix}bin", pa.binary())])

    # explicit schemas: .schema() on these lazy pipelines would
    # re-execute them as probes (see hash_join_via_groupby docstring)
    wa_schema = pa.schema(list(PAIRS_SCHEMA)
                          + [pa.field("a_bin", pa.binary())])
    side_a = emb.map_batches(packed("a_"), batch_format="pyarrow",
                             zero_copy_batch=True)
    side_b = emb.map_batches(packed("b_"), batch_format="pyarrow",
                             zero_copy_batch=True)
    with_a = hash_join_via_groupby(pairs, side_a, "id_a", "__k",
                                   dedupe_left=True,
                                   left_schema=PAIRS_SCHEMA,
                                   right_schema=side_schema("a_"))
    return hash_join_via_groupby(with_a, side_b, "id_b", "__k",
                                 post=verify,
                                 left_schema=wa_schema,
                                 right_schema=side_schema("b_")) \
        .sort(["id_a", "id_b"])
