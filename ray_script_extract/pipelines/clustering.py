"""Distributed spherical k-means over the embedding table — the
iterative-algorithm tier of the similarity family.

``similarity.kmeans_fit`` fits centroids on a BOUNDED driver sample
(good enough to seed an IVF index); this module runs full-dataset
Lloyd refinement the Ray-Data way: each iteration is one streaming
pass where the only state that moves is k centroids out (``ray.put``
broadcast, one object-store copy per node) and k partial sums back
(per-batch cluster sums packed as f8 bytes, reduced on one bounded
hash-partitioned shuffle).  Nothing vector-table-sized ever lands on
the driver, and per-iteration cost is a constant number of bytes per
input block — the shape that holds at 10^12 rows.

Determinism: partial sums are reduced in (cluster, batch-min-vec_id)
order inside each reduce partition, so the result is independent of
Ray's task scheduling/arrival order (float addition is not
associative; without the sort two runs of the same job could diverge
at cluster boundaries).

No reference counterpart (`/root/reference` is a one-document
converter); this extends the training-data pipeline family
(clustering for data curation / diversity sampling).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .similarity import _read_emb, kmeans_fit, _sample_matrix


def _normalized_ds(sf_dir: str) -> "ray.data.Dataset":
    """Read → L2-normalize → f8 fixed-size-list, materialized ONCE:
    the n_iter+1 downstream passes reuse the object-store blocks
    instead of re-reading parquet and re-converting list<float> →
    matrix every iteration (at 10^12 rows this is one spillable
    object-store copy the whole Lloyd loop amortizes).  Both pack and
    unpack are zero-Python-loop: ravel → FixedSizeListArray one way,
    flatten → reshape the other."""

    def pack(batch: pa.Table) -> pa.Table:
        import ray_script_extract as _rse
        _rse._tune_malloc()
        m = np.vstack(batch.column("embedding").to_numpy(
            zero_copy_only=False)).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        nemb = pa.FixedSizeListArray.from_arrays(
            pa.array(m.ravel(), pa.float64()), m.shape[1])
        return pa.table({"vec_id": batch.column("vec_id").cast(pa.int64()),
                         "nemb": nemb})

    return _read_emb(sf_dir).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True).materialize()


def _unpack(batch: pa.Table) -> "np.ndarray":
    flat = pc.list_flatten(batch.column("nemb"))
    return flat.to_numpy(zero_copy_only=False).reshape(len(batch), -1)


def _lloyd_pass(norm_ds: "ray.data.Dataset", centroids: np.ndarray,
                driver_combine: bool = False):
    """One distributed Lloyd iteration: returns (new_centroids,
    inertia, n_assigned) — inertia is Σ (1 - cos(x, c(x))) over
    normalized vectors, the spherical-k-means objective.

    ``driver_combine=True`` (chosen ONCE per fit from the parquet
    footer, same budget discipline as ``broadcast_int_lookup``)
    collects the ≤ k-rows-per-block partials straight to the driver
    and reduces them there — the per-pass all-to-all barrier is pure
    overhead while k × num_blocks × dim×8B is a few MB.  Past the
    budget the hash-partitioned shuffle reduce takes over unchanged.
    Both paths sort partials by (cluster, batch_ord) before the same
    reduceat, so they are bit-identical."""
    from .joins import hash_partitioned_map

    k, dim = centroids.shape
    bc = ray.put(centroids)

    def partial(batch: pa.Table) -> pa.Table:
        import ray_script_extract as _rse
        _rse._tune_malloc()  # by-value-pickled closure, see package doc
        cents = ray.get(bc)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        m = _unpack(batch)
        sims = m @ cents.T
        assign = sims.argmax(axis=1)
        best = sims[np.arange(len(m)), assign]
        order = np.argsort(assign, kind="stable")
        uniq, starts = np.unique(assign[order], return_index=True)
        sums = np.add.reduceat(m[order], starts, axis=0)
        counts = np.diff(np.append(starts, len(m)))
        inertia = np.zeros(len(uniq))
        np.add.at(inertia, np.searchsorted(uniq, assign), 1.0 - best)
        return pa.table({
            "cluster": pa.array(uniq.astype(np.int64), pa.int64()),
            "batch_ord": pa.array(
                np.full(len(uniq), ids.min(), np.int64), pa.int64()),
            "vec_sum": pa.array(
                [s.tobytes() for s in sums], pa.binary()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
            "inertia": pa.array(inertia, pa.float64()),
        })

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cluster", "batch_ord"], kind="stable")
        mats = np.frombuffer(
            b"".join(df["vec_sum"]), np.float64).reshape(len(df), -1)
        cl = df["cluster"].to_numpy()
        starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
        return pd.DataFrame({
            "cluster": cl[starts],
            "vec_sum": [s.tobytes() for s in
                        np.add.reduceat(mats, starts, axis=0)],
            "n": np.add.reduceat(df["n"].to_numpy(), starts),
            "inertia": np.add.reduceat(df["inertia"].to_numpy(), starts),
        })

    partials = norm_ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    if driver_combine:
        # ≤ k rows per input block; reduce() itself sorts by
        # (cluster, batch_ord) so the sum order is bit-identical to
        # the per-partition shuffle reduce
        parts = reduce(partials.to_pandas())
    else:
        parts = hash_partitioned_map(
            partials, ["cluster"], reduce).to_pandas()   # ≤ k rows

    parts = parts.sort_values("cluster")
    new = centroids.copy()
    for _, row in parts.iterrows():      # ≤ k iterations, driver-side
        vec = np.frombuffer(row["vec_sum"], np.float64) / row["n"]
        nv = np.linalg.norm(vec)
        if nv > 0:                       # same convention as kmeans_fit
            new[int(row["cluster"])] = vec / nv
    return new, float(parts["inertia"].sum()), int(parts["n"].sum())


def cluster_embeddings(sf_dir: str, n_clusters: int = 16,
                       n_iter: int = 5, return_stats: bool = False,
                       force_shuffle_combine: bool = False):
    """Full-dataset spherical k-means: seed on the bounded sample
    (``kmeans_fit``), refine with ``n_iter`` distributed Lloyd passes,
    then one final streaming pass emits the ``(vec_id, cluster)``
    assignment DATASET sorted by vec_id (never collected — at 10^12
    rows the assignment table is itself big data; consume it with
    write_parquet or a downstream stage).  ``return_stats=True``
    additionally returns the inertia trajectory and final centroids
    (n_iter floats + k×dim — driver-bounded metadata)."""
    import pyarrow.parquet as pq

    sample = _sample_matrix(sf_dir)
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True),
                         1e-12)
    centroids = kmeans_fit(sample, n_clusters)

    # footer-only strategy pick (no data I/O): partials are
    # k × num_blocks rows; below ~50M input rows that is a few MB, so
    # the per-pass shuffle barrier is pure overhead
    n_rows = pq.ParquetFile(
        f"{sf_dir}/embeddings.parquet").metadata.num_rows
    driver_combine = n_rows <= 50_000_000 and not force_shuffle_combine

    norm_ds = _normalized_ds(sf_dir)

    trajectory = []
    for _ in range(n_iter):
        centroids, inertia, _ = _lloyd_pass(norm_ds, centroids,
                                            driver_combine)
        trajectory.append(inertia)

    bc = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(bc)
        m = _unpack(batch)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "cluster": pa.array((m @ cents.T).argmax(axis=1)
                                .astype(np.int64), pa.int64()),
        })

    out = (norm_ds
           .map_batches(assign, batch_format="pyarrow",
                        zero_copy_batch=True)
           .sort("vec_id"))
    if return_stats:
        return out, trajectory, centroids
    return out
