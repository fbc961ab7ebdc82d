"""ANN (IVF) + embedding LSH near-dup vs brute-force: recall bounds
on real testdata."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_ivf_recall_vs_bruteforce():
    from ray_script_extract.pipelines.queries import knn_cosine
    from ray_script_extract.pipelines.similarity import knn_cosine_ivf

    exact = knn_cosine(SF).to_pandas()
    approx = knn_cosine_ivf(SF, n_probe=6).to_pandas()
    assert len(approx) == len(exact)
    recall_hits = 0
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recall_hits += len(e & a)
    recall = recall_hits / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


@pytest.mark.usefixtures("ray_session")
def test_kmeans_deterministic():
    import numpy as np

    from ray_script_extract.pipelines.similarity import (
        _sample_matrix,
        kmeans_fit,
    )

    mat = _sample_matrix(SF)
    c1 = kmeans_fit(mat, 8)
    c2 = kmeans_fit(mat, 8)
    assert np.array_equal(c1, c2)


@pytest.mark.usefixtures("ray_session")
def test_embedding_lsh_recall_vs_exact():
    """The bucketed near-dup must recover ~all pairs the exact
    O(N²) path finds (32 bands × 4 bits ⇒ ≥ ~99.5% recall at the
    τ=0.4 boundary), with zero false positives (exact verify)."""
    from ray_script_extract.pipelines.queries import near_dup_embeddings
    from ray_script_extract.pipelines.similarity import near_dup_embeddings_lsh

    exact = near_dup_embeddings(SF).to_pandas()
    approx = near_dup_embeddings_lsh(SF).to_pandas()
    exact_pairs = set(zip(exact["id_a"], exact["id_b"]))
    approx_pairs = set(zip(approx["id_a"], approx["id_b"]))
    assert approx_pairs <= exact_pairs, "LSH path produced a false positive"
    if exact_pairs:
        recall = len(approx_pairs & exact_pairs) / len(exact_pairs)
        assert recall >= 0.9, f"LSH near-dup recall too low: {recall}"
