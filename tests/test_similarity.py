"""ANN (IVF) vs brute-force: recall bound on real testdata."""

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

    from ray_script_extract.pipelines.similarity import _load_matrix, kmeans_fit

    _, mat = _load_matrix(SF)
    c1 = kmeans_fit(mat, 8)
    c2 = kmeans_fit(mat, 8)
    assert np.array_equal(c1, c2)
