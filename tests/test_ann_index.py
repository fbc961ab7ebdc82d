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

    from ray_script_extract.pipelines.ann_index import _corpus_fingerprint
    _SHARED_INDEX.pop((SF, 8, _corpus_fingerprint(SF)), None)


def test_index_identity_fingerprint(tmp_path):
    """The default index dir embeds a corpus fingerprint: distinct
    corpora can't collide, and regenerating embeddings.parquet in
    place changes the dir name so a stale index is never reused
    (ADVICE r4)."""
    import shutil as _sh

    from ray_script_extract.pipelines.ann_index import _default_index_dir

    a = tmp_path / "sf_0.01"
    b = tmp_path / "sf" / "0.01"  # old lossy flattening collided these
    for d in (a, b):
        d.mkdir(parents=True)
        _sh.copy(os.path.join(SF, "embeddings.parquet"),
                 d / "embeddings.parquet")
    assert _default_index_dir(str(a), 8) != _default_index_dir(str(b), 8)

    before = _default_index_dir(str(a), 8)
    os.utime(a / "embeddings.parquet", ns=(1, 1))  # "regenerate" corpus
    assert _default_index_dir(str(a), 8) != before


@pytest.mark.usefixtures("ray_session")
def test_partial_build_never_double_counts(tmp_path):
    """A half-populated index dir (crashed prior build: lists/ files
    but no _SUCCESS) is cleared and rebuilt atomically — vector counts
    equal the corpus exactly, and no orphan temp dir survives."""
    import pyarrow.parquet as pq

    from ray_script_extract.pipelines.ann_index import build_ivf_index

    idx = tmp_path / "ivf"
    stray = idx / "lists" / "list_id=0"
    stray.mkdir(parents=True)
    (stray / "orphan.parquet").write_bytes(b"not a real parquet")

    manifest = _df(build_ivf_index(SF, index_dir=str(idx), n_clusters=8))
    n_corpus = pq.read_metadata(
        os.path.join(SF, "embeddings.parquet")).num_rows
    assert int(manifest["n_vectors"].sum()) == n_corpus
    assert not (stray / "orphan.parquet").exists()
    assert not [d for d in os.listdir(tmp_path)
                if d.startswith("ivf.build-")]


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


@pytest.mark.usefixtures("ray_session")
def test_incremental_append_equals_full_build(tmp_path):
    """Base build over even vec_ids + an appended odd-vec segment must
    be CONTENT-IDENTICAL to a one-shot full build (same full-corpus
    centroid fit): equal manifests AND equal top-k query results."""
    from ray_script_extract.pipelines.ann_index import (
        append_ivf_index,
        build_ivf_index,
        knn_cosine_ivf_indexed,
        _index_manifest,
    )

    full_dir = str(tmp_path / "full")
    inc_dir = str(tmp_path / "inc")
    full = _df(build_ivf_index(SF, index_dir=full_dir, n_clusters=8))
    _df(build_ivf_index(SF, index_dir=inc_dir, n_clusters=8,
                        predicate=lambda ids: ids % 2 == 0))
    seg = append_ivf_index(SF, "odd", index_dir=inc_dir, n_clusters=8,
                           predicate=lambda ids: ids % 2 == 1)
    assert os.path.exists(os.path.join(seg, "_SUCCESS"))

    inc = _df(_index_manifest(inc_dir))
    pd.testing.assert_frame_equal(inc, full)

    q_full = _df(knn_cosine_ivf_indexed(SF, n_clusters=8,
                                        index_dir=full_dir))
    q_inc = _df(knn_cosine_ivf_indexed(SF, n_clusters=8,
                                       index_dir=inc_dir))
    pd.testing.assert_frame_equal(q_inc, q_full)

    # idempotent retry: the same batch_id is a no-op
    seg2 = append_ivf_index(SF, "odd", index_dir=inc_dir, n_clusters=8,
                            predicate=lambda ids: ids % 2 == 1)
    assert seg2 == seg
    pd.testing.assert_frame_equal(_df(_index_manifest(inc_dir)), full)


@pytest.mark.usefixtures("ray_session")
def test_predicate_build_requires_explicit_dir():
    from ray_script_extract.pipelines.ann_index import build_ivf_index

    with pytest.raises(ValueError):
        build_ivf_index(SF, predicate=lambda ids: ids % 2 == 0)


@pytest.mark.usefixtures("ray_session")
def test_append_requires_completed_base(tmp_path):
    from ray_script_extract.pipelines.ann_index import append_ivf_index

    with pytest.raises(ValueError):
        append_ivf_index(SF, "b0", index_dir=str(tmp_path / "missing"))
