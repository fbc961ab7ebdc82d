"""Persistent IVF index (pipelines/ann_index.py): build/query split,
indexed-equals-in-memory results, idempotent rebuild, and
partition-level read pruning."""

from __future__ import annotations

import os

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _df(res) -> pd.DataFrame:
    res = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    return res.reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_indexed_equals_in_memory(tmp_path):
    from ray_script_extract.pipelines.ann_index import (
        _SHARED_INDEX, build_ivf_index, knn_cosine_ivf_indexed)
    from ray_script_extract.pipelines.similarity import knn_cosine_ivf

    idx = str(tmp_path / "ivf")
    manifest = _df(build_ivf_index(SF, index_dir=idx, n_clusters=8))
    assert manifest["n_vectors"].sum() > 0
    assert manifest["list_id"].is_unique
    assert os.path.exists(os.path.join(idx, "_SUCCESS"))

    got = _df(knn_cosine_ivf_indexed(SF, n_clusters=8))
    ref = _df(knn_cosine_ivf(SF, n_clusters=8))
    pd.testing.assert_frame_equal(got, ref)

    # idempotent rebuild: the marker short-circuits, dir unchanged
    mtime = os.path.getmtime(os.path.join(idx, "_SUCCESS"))
    build_ivf_index(SF, index_dir=idx, n_clusters=8)
    assert os.path.getmtime(os.path.join(idx, "_SUCCESS")) == mtime

    _SHARED_INDEX.pop((SF, 8), None)


@pytest.mark.usefixtures("ray_session")
def test_partition_pruning(tmp_path):
    """The query read must touch only the probed hive partitions."""
    from ray_script_extract.pipelines.ann_index import (_read_lists,
                                                        build_ivf_index)

    idx = str(tmp_path / "ivf")
    manifest = _df(build_ivf_index(SF, index_dir=idx, n_clusters=8))
    lists_dir = os.path.join(idx, "lists")
    parts = [d for d in os.listdir(lists_dir) if d.startswith("list_id=")]
    assert len(parts) == len(manifest)

    some = int(manifest["list_id"].iloc[0])
    pruned = _read_lists(idx, columns=["vec_id", "list_id"],
                         probed={some})
    n = pruned.count()
    assert n == int(manifest.loc[manifest["list_id"] == some,
                                 "n_vectors"].iloc[0])
    # strictly fewer rows than the whole corpus => the filter pruned
    assert n < int(manifest["n_vectors"].sum())
